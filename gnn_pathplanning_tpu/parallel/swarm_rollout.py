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


class SwarmRollout(NamedTuple):
    final_pos: jax.Array   # [N, 2]
    reached: jax.Array     # [N] bool (latched)
    paths: jax.Array       # [T+1, N, 2]


def swarm_rollout(mesh: Mesh, variables, grid: jax.Array, starts: jax.Array,
                  goals: jax.Array, radius: float, steps: int,
                  key: jax.Array, axis: str = "agents") -> SwarmRollout:
    """Run `steps` closed-loop steps with the agent axis sharded over
    ``axis``. N must be divisible by the mesh axis size."""
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
            s_cols = gso_cols_body(pos_loc.astype(jnp.float32), r, axis)
            feat_loc = dcp_encode(variables, obs_loc)
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
            nxt_full, _, _ = collision_shield(pos_full, prop_full, step_key)
            nxt_loc = jax.lax.dynamic_slice_in_dim(nxt_full, shard * n_loc,
                                                   n_loc)
            reached_loc = reached_loc | jnp.all(nxt_loc == goals_loc, axis=-1)
            return (nxt_loc, reached_loc), nxt_loc

        # the fresh zeros carry must be marked axis-varying to match the
        # per-shard outputs of the scan body
        init = (starts_loc.astype(jnp.int32),
                jax.lax.pcast(jnp.zeros((n_loc,), bool), (axis,), to="varying"))
        (pos_loc, reached_loc), path_loc = jax.lax.scan(step_fn, init, keys)
        return pos_loc, reached_loc, path_loc

    final_pos, reached, path_tail = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis), P(None, axis, None)))(
            jnp.asarray(starts, jnp.int32), jnp.asarray(goals, jnp.int32))
    paths = jnp.concatenate([jnp.asarray(starts, jnp.int32)[None],
                             path_tail], axis=0)
    return SwarmRollout(final_pos=final_pos, reached=reached, paths=paths)
