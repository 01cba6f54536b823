"""Fully agent-sharded closed-loop rollout for large swarms.

The scaling story of SURVEY §2.3 / BASELINE.md's stress config (1024+
agents): the *agent* axis shards across the mesh. Each chip owns N/d agents
and, per step:

1. all_gathers the (tiny) [N, 2] position array over ICI,
2. renders its own agents' FOV windows (global occupancy from the gather),
3. builds its GSO *column block* (`swarm.gso_cols_body` — degrees via psum,
   no chip materializes N x N),
4. encodes locally through the shared CNN, exchanges K-hop features through
   `swarm.graph_filter_body` (all_gather halo per hop),
5. proposes moves locally and resolves collisions on the gathered global
   state (the conflict fixed-point is O(N^2) boolean work — replicated per
   chip, negligible next to the conv/filter FLOPs, and guarantees all chips
   take identical decisions from the shared PRNG key).

The policy runs from raw DCP parameter pytrees via the pure-jax forward in
this module (`dcp_encode`/`dcp_act`) — numerically identical to
``DCPNet.apply`` in eval mode (tested) — so trained checkpoints drop in.

Communication radius is fixed for the rollout (the reference's
``computeAdjacencyMatrix_fixedCommRadius`` mode, multirobotsim:291-317);
connect-growth at swarm scale would densify the graph quadratically and is
intentionally not replicated here.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..env.simulator import DELTAS, STOP, collision_shield
from ..ops.fov import render_fov
from ..ops.pallas_swarm import make_geometric_ops, pad_agents, pad_to_block
from .halo import halo_filter_body
from .swarm import graph_filter_body, gso_cols_body


# ------------------------------------------------ pure-jax DCP forward
_POOL_AFTER = (0, 2, 4)


def dcp_encode(variables, obs: jax.Array) -> jax.Array:
    """Eval-mode CNN + compress forward from raw DCPNet variables:
    [M, 3, 11, 11] -> [M, F]. Matches DCPNet.apply(train=False)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    x = obs.transpose(0, 2, 3, 1)
    for i in range(5):
        k = p[f"conv{i}"]["kernel"]
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p[f"conv{i}"]["bias"]
        mean, var = bs[f"bn{i}"]["mean"], bs[f"bn{i}"]["var"]
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x * p[f"bn{i}"]["scale"] + p[f"bn{i}"]["bias"]
        x = jax.nn.relu(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    x = x.reshape(x.shape[0], -1)
    x = x @ p["compress0"]["kernel"] + p["compress0"]["bias"]
    return jax.nn.relu(x)


def dcp_act(variables, feat: jax.Array) -> jax.Array:
    """Action head from raw variables: [M, F] -> [M, 5]."""
    p = variables["params"]
    return feat @ p["actions0"]["kernel"] + p["actions0"]["bias"]


def dcp_gfl(variables):
    """(taps [K, G, F], bias [F]) of the graph filter layer."""
    p = variables["params"]["gfl0"]
    return p["taps"], p["bias"]


def geometric_filter_body(x_loc: jax.Array, pos_loc: jax.Array,
                          pos_full: jax.Array, r: jax.Array, taps: jax.Array,
                          bias: jax.Array | None, axis: str,
                          interpret: bool = False,
                          cap: int | None = None) -> jax.Array:
    """K-tap graph filter inner body on the *geometric* Pallas path
    (callable inside any shard_map over ``axis``): x_loc [N/d, G],
    pos_loc [N/d, 2], pos_full [N, 2] -> [N/d, F].

    Per-chip memory is O(N*G) (the halo gather) + O(NB_send * NB_recv)
    (the block-pair mask) — no [N, N/d] dense GSO block is ever built,
    unlike ``gso_cols_body``. Receivers are the chip's local agents;
    senders are the whole swarm; edge weights are recomputed from
    positions inside each active 128x128 block pair on the VPU and fed
    straight to the MXU (ops/pallas_swarm.py).
    """
    n_loc, g = x_loc.shape
    send_pos, _, send_valid = pad_agents(pos_full.astype(jnp.float32))
    recv_pos, _, recv_valid = pad_agents(pos_loc.astype(jnp.float32))
    # cap routes through the compacted scalar-prefetch grid (sender blocks
    # DMA'd only for active pairs) with an exact in-jit overflow fallback;
    # neither branch holds collectives, so per-chip divergence is fine.
    degrees_fn, spmm = make_geometric_ops(send_pos, send_valid, r,
                                          recv_pos, recv_valid, cap,
                                          interpret)

    # Degrees: each chip computes its receivers' degrees against the full
    # sender set, then the full inverse-sqrt vector is assembled by halo
    # exchange (degree of agent m is identical on every chip).
    deg_loc = degrees_fn()[:n_loc]
    deg_full = jax.lax.all_gather(deg_loc, axis, tiled=True)      # [N]
    inv_full = jnp.where(deg_full > 1e-9,
                         jax.lax.rsqrt(jnp.maximum(deg_full, 1e-9)), 0.0)
    shard = jax.lax.axis_index(axis)
    inv_loc = jax.lax.dynamic_slice_in_dim(inv_full, shard * n_loc, n_loc)

    n_pad = send_pos.shape[0]
    k_taps = taps.shape[0]
    zs = [x_loc]
    z = x_loc
    for _ in range(1, k_taps):
        z_full = jax.lax.all_gather(z, axis, tiled=True)          # halo [N, G]
        z_pad = jnp.zeros((n_pad, g), x_loc.dtype).at[:z_full.shape[0]].set(
            inv_full[:, None] * z_full)
        z = inv_loc[:, None] * spmm(z_pad)[:n_loc]
        zs.append(z)
    stacked = jnp.concatenate(zs, axis=-1)
    w2 = taps.reshape(k_taps * taps.shape[1], taps.shape[2])
    # HIGHEST: match graph_filter_geometric (default TPU matmul truncates
    # f32 inputs to bf16; the tap contraction is cheap next to the SpMM).
    y = jnp.dot(stacked, w2, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y


class SwarmRollout(NamedTuple):
    final_pos: jax.Array   # [N, 2]
    reached: jax.Array     # [N] bool (latched)
    paths: jax.Array       # [T+1, N, 2]
    shield_rounds: jax.Array  # [T] int32: shield fixed-point rounds per step


class HaloRollout(NamedTuple):
    final_pos: jax.Array   # [N, 2]
    reached: jax.Array     # [N] bool (latched)
    paths: jax.Array       # [T+1, N, 2]
    exact: jax.Array       # [T] bool: strip invariant held at each step
    shield_rounds: jax.Array  # [T] int32: shield fixed-point rounds per step


def swarm_rollout_halo(mesh: Mesh, variables, grid: jax.Array,
                       starts: jax.Array, goals: jax.Array, radius: float,
                       steps: int, key: jax.Array,
                       axis: str = "agents",
                       geometric: bool = False,
                       cap: int | None = None,
                       interpret: bool = False,
                       on_inexact: str = "fallback") -> HaloRollout:
    """Closed-loop rollout with *constant per-chip collective volume*.

    Every step re-partitions agents into x-sorted strips (ownership is
    decoupled from agent identity), renders/encodes each chip's owned
    agents, and exchanges K-hop features with only the two adjacent strips
    (:func:`.halo.halo_filter_body`) — 2*(N/d)*G bytes per hop per chip
    regardless of device count, vs the N*G all_gather of the dense and
    geometric paths.  Only O(N) scalars (positions, proposed moves) cross
    the full mesh, so the feature traffic weak-scales to pod size.

    Collision shielding runs on the replicated identity-order global state
    with the same PRNG key schedule as :func:`swarm_rollout`, so shield
    decisions are bit-identical to the dense path; action logits match up
    to summation-order rounding whenever the strip invariant (every strip
    wider than the comm radius) holds.  ``exact[t]`` reports a sufficient
    per-step check of that invariant (consecutive-strip x-gaps >= r).

    ``on_inexact`` gates what happens on a step where that check fails
    (agents crowding can silently break neighbor-only exactness):

    - ``"fallback"`` (default): the step's K-hop exchange routes through
      the exact all_gather path (``gso_cols_body``+``graph_filter_body``,
      or ``geometric_filter_body`` when ``geometric=True``) via
      ``lax.cond`` — correct trajectories always, at that step's cost
      rising to the all_gather volume.  The check is replicated (computed
      from the gathered global positions with identical arithmetic on
      every chip), so all chips take the same branch and the collectives
      inside the cond stay uniform.
    - ``"flag"``: previous behavior — halo exchange unconditionally, the
      caller must inspect ``exact`` (kept for benchmarking the pure-halo
      path).
    """
    if on_inexact not in ("fallback", "flag"):
        raise ValueError(f"on_inexact must be 'fallback' or 'flag', "
                         f"got {on_inexact!r}")
    taps, gfl_bias = dcp_gfl(variables)
    grid = jnp.asarray(grid, jnp.float32)
    w, h = grid.shape
    keys = jax.random.split(key, steps)
    r = jnp.float32(radius)
    d = mesh.shape[axis]
    n = starts.shape[0]
    if n % d:
        raise ValueError(f"agent count {n} must divide evenly across the "
                         f"{d}-way '{axis}' mesh axis")
    n_loc = n // d

    def body(starts_full, goals_full):
        shard = jax.lax.axis_index(axis)

        def step_fn(carry, step_key):
            pos_full, reached_full = carry
            # --- spatial re-partition: chip i owns the i-th x-strip
            fpos = pos_full.astype(jnp.float32)
            ids = jnp.lexsort((fpos[:, 1], fpos[:, 0]))          # [N]
            my_ids = jax.lax.dynamic_slice_in_dim(ids, shard * n_loc, n_loc)
            pos_loc = pos_full[my_ids]
            goals_loc = goals_full[my_ids]

            # sufficient exactness check: strips >= 2 apart have x-gap >= r
            exact = jnp.asarray(True)
            if d > 2:
                x_sorted = fpos[ids, 0]
                i = jnp.arange(d - 2)
                gap = x_sorted[(i + 2) * n_loc] - x_sorted[(i + 1) * n_loc - 1]
                exact = jnp.all(gap >= r)

            obs_loc = render_fov(grid, pos_loc, goals_loc,
                                 occupancy_pos=pos_full)
            feat_loc = dcp_encode(variables, obs_loc)

            def halo_branch(feat, ploc):
                return halo_filter_body(
                    feat, ploc.astype(jnp.float32), r, taps, gfl_bias,
                    axis, d, geometric=geometric, cap=cap,
                    interpret=interpret)

            def exact_branch(feat, ploc):
                # Exact regardless of strip geometry: senders are the whole
                # swarm. Strip order is preserved end-to-end, so the
                # self-loop bookkeeping in gso_cols_body stays consistent.
                if geometric:
                    return geometric_filter_body(
                        feat, ploc, pos_full, r, taps, gfl_bias, axis,
                        interpret=interpret, cap=cap)
                s_cols = gso_cols_body(ploc.astype(jnp.float32), r, axis)
                return graph_filter_body(feat, s_cols, taps, gfl_bias, axis)

            if on_inexact == "fallback" and d > 2:
                pre = jax.lax.cond(exact, halo_branch, exact_branch,
                                   feat_loc, pos_loc)
            else:
                pre = halo_branch(feat_loc, pos_loc)
            y_loc = jax.nn.relu(pre)
            logits_loc = dcp_act(variables, y_loc)

            actions = jnp.argmax(logits_loc, axis=-1)
            prop = pos_loc + DELTAS[actions]
            oob = ((prop[:, 0] < 0) | (prop[:, 0] >= w) |
                   (prop[:, 1] < 0) | (prop[:, 1] >= h))
            safe = jnp.clip(prop, 0, jnp.array([w - 1, h - 1], jnp.int32))
            blocked = grid[safe[:, 0], safe[:, 1]] > 0
            prop = jnp.where((oob | blocked)[:, None], pos_loc, prop)

            # scatter proposals back to identity order ([N, 2] ints only)
            prop_all = jax.lax.all_gather(prop, axis, tiled=True)   # [N, 2]
            prop_full = jnp.zeros_like(pos_full).at[ids].set(prop_all)
            nxt_full, _, _, rounds = collision_shield(pos_full, prop_full,
                                                      step_key,
                                                      extent=(w, h))
            reached_full = reached_full | jnp.all(nxt_full == goals_full,
                                                  axis=-1)
            # per-chip identity-order slice for the paths output
            path_slice = jax.lax.dynamic_slice_in_dim(nxt_full,
                                                      shard * n_loc, n_loc)
            return (nxt_full, reached_full), (path_slice, exact, rounds)

        # the carry passes through all_gather-derived values, which the vma
        # system types as axis-varying — the init must match
        init = (jax.lax.pcast(starts_full.astype(jnp.int32), (axis,),
                              to="varying"),
                jax.lax.pcast(jnp.zeros((n,), bool), (axis,), to="varying"))
        (pos_full, reached_full), (path_loc, exact, rounds) = jax.lax.scan(
            step_fn, init, keys)
        final_loc = jax.lax.dynamic_slice_in_dim(pos_full, shard * n_loc,
                                                 n_loc)
        reached_loc = jax.lax.dynamic_slice_in_dim(reached_full,
                                                   shard * n_loc, n_loc)
        # exact/rounds are identical on every shard but typed varying; emit
        # one row per shard and keep row 0 outside
        return final_loc, reached_loc, path_loc, exact[None], rounds[None]

    final_pos, reached, path_tail, exact, rounds = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis, None), P(axis), P(None, axis, None),
                   P(axis, None), P(axis, None)),
        check_vma=not geometric)(
            jnp.asarray(starts, jnp.int32), jnp.asarray(goals, jnp.int32))
    paths = jnp.concatenate([jnp.asarray(starts, jnp.int32)[None],
                             path_tail], axis=0)
    return HaloRollout(final_pos=final_pos, reached=reached, paths=paths,
                       exact=exact[0], shield_rounds=rounds[0])


def swarm_rollout(mesh: Mesh, variables, grid: jax.Array, starts: jax.Array,
                  goals: jax.Array, radius: float, steps: int,
                  key: jax.Array, axis: str = "agents",
                  geometric: bool = False,
                  interpret: bool = False,
                  cap: int | None = None) -> SwarmRollout:
    """Run `steps` closed-loop steps with the agent axis sharded over
    ``axis``. N must be divisible by the mesh axis size.

    ``geometric=True`` routes the K-hop exchange through the fused Pallas
    position->SpMM path (``geometric_filter_body``) so no chip ever builds
    an [N, N/d] dense GSO block — the BASELINE.md stress regime (1024+
    agents). ``interpret`` runs those kernels in interpret mode (CPU CI)."""
    taps, gfl_bias = dcp_gfl(variables)
    grid = jnp.asarray(grid, jnp.float32)
    w, h = grid.shape
    keys = jax.random.split(key, steps)
    r = jnp.float32(radius)

    def body(starts_loc, goals_loc):
        n_loc = starts_loc.shape[0]
        shard = jax.lax.axis_index(axis)

        def step_fn(carry, step_key):
            pos_loc, reached_loc = carry
            pos_full = jax.lax.all_gather(pos_loc, axis, tiled=True)
            obs_loc = render_fov(grid, pos_loc, goals_loc,
                                 occupancy_pos=pos_full)
            feat_loc = dcp_encode(variables, obs_loc)
            if geometric:
                # Per-step spatial sort (per shard, like the halo path's
                # strips): without it agent order is identity/random, every
                # block's bounding box spans the world, the block-pair mask
                # is all-active and the compact grid permanently overflows
                # to the exhaustive fallback — measured: geometric ==
                # compact at N=8192 (swarm_stress_r3). Sorting restores the
                # block-banded structure; the filter sum is permutation-
                # invariant (up to f32 summation order) and the output is
                # unpermuted back to local agent order.
                from ..ops.pallas_swarm import spatial_sort
                perm = spatial_sort(pos_loc.astype(jnp.float32), cell=r)
                inv = jnp.argsort(perm)
                pos_s = pos_loc[perm]
                feat_s = feat_loc[perm]
                pos_full_s = jax.lax.all_gather(pos_s, axis, tiled=True)
                y_s = jax.nn.relu(geometric_filter_body(
                    feat_s, pos_s, pos_full_s, r, taps, gfl_bias, axis,
                    interpret=interpret, cap=cap))
                y_loc = y_s[inv]
            else:
                s_cols = gso_cols_body(pos_loc.astype(jnp.float32), r, axis)
                y_loc = jax.nn.relu(
                    graph_filter_body(feat_loc, s_cols, taps, gfl_bias, axis))
            logits_loc = dcp_act(variables, y_loc)

            actions = jnp.argmax(logits_loc, axis=-1)
            prop = pos_loc + DELTAS[actions]
            oob = ((prop[:, 0] < 0) | (prop[:, 0] >= w) |
                   (prop[:, 1] < 0) | (prop[:, 1] >= h))
            safe = jnp.clip(prop, 0, jnp.array([w - 1, h - 1], jnp.int32))
            blocked = grid[safe[:, 0], safe[:, 1]] > 0
            prop = jnp.where((oob | blocked)[:, None], pos_loc, prop)

            prop_full = jax.lax.all_gather(prop, axis, tiled=True)
            nxt_full, _, _, rounds = collision_shield(pos_full, prop_full,
                                                      step_key,
                                                      extent=(w, h))
            nxt_loc = jax.lax.dynamic_slice_in_dim(nxt_full, shard * n_loc,
                                                   n_loc)
            reached_loc = reached_loc | jnp.all(nxt_loc == goals_loc, axis=-1)
            return (nxt_loc, reached_loc), (nxt_loc, rounds)

        # the fresh zeros carry must be marked axis-varying to match the
        # per-shard outputs of the scan body
        init = (starts_loc.astype(jnp.int32),
                jax.lax.pcast(jnp.zeros((n_loc,), bool), (axis,), to="varying"))
        (pos_loc, reached_loc), (path_loc, rounds) = jax.lax.scan(
            step_fn, init, keys)
        # rounds is identical on every shard but typed varying; emit one row
        # per shard and keep row 0 outside (same pattern as halo's `exact`).
        return pos_loc, reached_loc, path_loc, rounds[None]

    # check_vma stays on for the dense path (regression guard); the pallas
    # interpreter/lowering cannot yet mix varying operands with invariant
    # grid indices, so the geometric path disables the check (the JAX
    #-recommended workaround) — pcast degrades to a no-op there.
    final_pos, reached, path_tail, rounds = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis), P(None, axis, None),
                   P(axis, None)),
        check_vma=not geometric)(
            jnp.asarray(starts, jnp.int32), jnp.asarray(goals, jnp.int32))
    paths = jnp.concatenate([jnp.asarray(starts, jnp.int32)[None],
                             path_tail], axis=0)
    return SwarmRollout(final_pos=final_pos, reached=reached, paths=paths,
                        shield_rounds=rounds[0])
