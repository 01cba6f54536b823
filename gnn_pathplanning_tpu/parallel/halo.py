"""Strip-partitioned K-hop graph filter with neighbor-only halo exchange.

Weak-scaling rationale (BASELINE.md: >=80% edges/s scaling efficiency).
The agent-sharded filter in :mod:`.swarm` all_gathers the full ``[N, G]``
feature array every hop, so per-chip collective volume grows linearly with
the device count — fine on one host, but it caps weak scaling at pod scale.
This module exploits the *geometry* of the communication graph instead: the
GSO only connects agents within the communication radius ``r``
(/root/reference/utils/multirobotsim_dcenlocal.py:338 ``distances <
communicationRadius``), so if agents are partitioned into spatial strips
(globally sorted by x, equal counts per chip) and every strip is at least
``r`` wide, all of a chip's neighbors live on the two adjacent chips.  Each
hop then needs exactly one ``ppermute`` to the left and one to the right —
``2 * (N/d) * G`` bytes per chip **independent of the device count** — the
direct analog of ring attention's neighbor passing, riding ICI.

Exactness condition: any two agents within ``r`` of each other are at most
one strip apart (:func:`strip_halo_exact` checks it host-side).  In the
weak-scaling regime (fixed agents-per-chip, area grows with the swarm) the
strip width is constant while ``r`` is fixed, so the condition holds by
construction for large-enough per-chip populations.

All bodies are written per-sample and callable inside any ``shard_map``
over the agent axis; ``vmap`` over batch composes on the outside.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def strip_partition(pos) -> np.ndarray:
    """Host-side partition order: indices that sort agents by (x, y).

    Distribute ``pos[strip_partition(pos)]`` contiguously across chips so
    chip ``i`` owns the ``i``-th x-strip. Returns an ``[N]`` int array.
    """
    pos = np.asarray(pos)
    return np.lexsort((pos[:, 1], pos[:, 0]))


def strip_halo_exact(pos_sorted, num_shards: int, radius: float) -> bool:
    """Whether neighbor-only halo exchange is *exact* for this partition:
    every pair of agents within ``radius`` is at most one strip apart."""
    pos = np.asarray(pos_sorted, np.float64)
    n = pos.shape[0]
    if n % num_shards:
        raise ValueError("N must divide evenly across shards")
    n_loc = n // num_shards
    strip = np.arange(n) // n_loc
    diff = pos[:, None, :] - pos[None, :, :]
    close = np.sqrt((diff * diff).sum(-1)) < radius
    gap = np.abs(strip[:, None] - strip[None, :]) > 1
    return not bool((close & gap).any())


def _from_left(v: jax.Array, axis: str, num_shards: int) -> jax.Array:
    """Each chip receives its left neighbor's value (chip 0 gets zeros)."""
    perm = [(i, i + 1) for i in range(num_shards - 1)]
    return jax.lax.ppermute(v, axis, perm)


def _from_right(v: jax.Array, axis: str, num_shards: int) -> jax.Array:
    """Each chip receives its right neighbor's value (last chip gets zeros)."""
    perm = [(i + 1, i) for i in range(num_shards - 1)]
    return jax.lax.ppermute(v, axis, perm)


def halo_filter_body(x_loc: jax.Array, pos_loc: jax.Array, r: jax.Array,
                     taps: jax.Array, bias: jax.Array | None, axis: str,
                     num_shards: int, geometric: bool = False,
                     cap: int | None = None,
                     interpret: bool = False) -> jax.Array:
    """K-tap graph filter inner body with neighbor-only halo exchange
    (callable inside any shard_map over ``axis``): x_loc [N/d, G],
    pos_loc [N/d, 2] -> [N/d, F].

    Requires the strip partition invariant (see module docstring). Matches
    :func:`..ops.graph_filter.graph_filter` exactly when it holds: the
    contraction is ``z[n] = sum_m S[m, n] x[m]`` over the symmetric
    degree-normalized adjacency (``D^-1/2 W D^-1/2``, zero-degree guard as
    in multirobotsim_dcenlocal.py:342-348).

    ``geometric=True`` replaces the dense [3*N/d, N/d] per-chip strip
    matrix (the last O((N/d)^2) term in the halo path) with the fused
    Pallas position->SpMM kernels over the strip: per-chip compute and
    memory become O(active block pairs) — combined with the constant
    2*(N/d)*G halo traffic this is the full pod-scale weak-scaling form.
    ``cap`` additionally routes through the compacted scalar-prefetch grid
    (ops/pallas_swarm.py).
    """
    n_loc, g = x_loc.shape
    shard = jax.lax.axis_index(axis)
    left_ok = (shard > 0).astype(jnp.float32)
    right_ok = (shard < num_shards - 1).astype(jnp.float32)

    pos_loc = pos_loc.astype(jnp.float32)
    pos_send = jnp.concatenate([
        _from_left(pos_loc, axis, num_shards),
        pos_loc,
        _from_right(pos_loc, axis, num_shards)], axis=0)    # [3n, 2]
    send_valid = jnp.concatenate([
        jnp.full((n_loc,), left_ok),
        jnp.ones((n_loc,), jnp.float32),
        jnp.full((n_loc,), right_ok)])                       # [3n]

    if geometric:
        from ..ops.pallas_swarm import make_geometric_ops, pad_agents

        # Invalid halo copies (chip 0's left / last chip's right arrive as
        # ppermute zeros) are masked through send_valid; padding lanes sit
        # at the pad_agents far-away corner.
        send_pad, _, sv_pad = pad_agents(pos_send)
        sv_pad = sv_pad.at[:3 * n_loc].mul(send_valid)
        recv_pad, _, rv_pad = pad_agents(pos_loc)
        degrees_fn, spmm = make_geometric_ops(send_pad, sv_pad, r,
                                              recv_pad, rv_pad, cap,
                                              interpret)
        deg_loc = degrees_fn()[:n_loc]
        inv_loc = jnp.where(deg_loc > 1e-9,
                            jax.lax.rsqrt(jnp.maximum(deg_loc, 1e-9)), 0.0)
        inv_send = jnp.concatenate([
            _from_left(inv_loc, axis, num_shards),
            inv_loc,
            _from_right(inv_loc, axis, num_shards)])         # [3n]

        n_pad = send_pad.shape[0]
        k_taps = taps.shape[0]
        zs = [x_loc]
        z = x_loc
        for _ in range(1, k_taps):
            z_send = jnp.concatenate([
                _from_left(z, axis, num_shards),
                z,
                _from_right(z, axis, num_shards)], axis=0)   # halo [3n, g]
            z_pad = jnp.zeros((n_pad, g), x_loc.dtype).at[:3 * n_loc].set(
                inv_send[:, None] * z_send)
            z = inv_loc[:, None] * spmm(z_pad)[:n_loc]
            zs.append(z)
        stacked = jnp.concatenate(zs, axis=-1)
        # HIGHEST: match graph_filter_geometric (default TPU matmul
        # truncates f32 inputs to bf16).
        y = jnp.dot(stacked,
                    taps.reshape(k_taps * taps.shape[1], taps.shape[2]),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias
        return y

    diff = pos_send[:, None, :] - pos_loc[None, :, :]        # [3n, n, 2]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    w = (dist < r).astype(jnp.float32) * send_valid[:, None]
    # self-loops: sender row n_loc + j is receiver j
    rows = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    w = jnp.where(rows == cols + n_loc, 0.0, w)

    # Receiver degrees are exact under the strip invariant (all neighbors of
    # a local agent are in the sender set); halo degrees arrive by the same
    # neighbor exchange since every agent is local on exactly one chip.
    deg_loc = jnp.sum(w, axis=0)                             # [n]
    inv_loc = jnp.where(deg_loc > 1e-9,
                        jax.lax.rsqrt(jnp.maximum(deg_loc, 1e-9)), 0.0)
    inv_send = jnp.concatenate([
        _from_left(inv_loc, axis, num_shards),
        inv_loc,
        _from_right(inv_loc, axis, num_shards)])             # [3n]
    s_cols = w * inv_send[:, None] * inv_loc[None, :]        # [3n, n]

    k_taps = taps.shape[0]
    zs = [x_loc]
    z = x_loc
    for _ in range(1, k_taps):
        z_send = jnp.concatenate([
            _from_left(z, axis, num_shards),
            z,
            _from_right(z, axis, num_shards)], axis=0)       # halo [3n, g]
        z = jnp.einsum("mn,mg->ng", s_cols, z_send)
        zs.append(z)
    stacked = jnp.concatenate(zs, axis=-1)
    y = stacked @ taps.reshape(k_taps * taps.shape[1], taps.shape[2])
    if bias is not None:
        y = y + bias
    return y


def halo_graph_filter_sharded(mesh: Mesh, x: jax.Array, pos: jax.Array,
                              radius, weights: jax.Array,
                              bias: jax.Array | None = None,
                              axis: str = "agents",
                              geometric: bool = False,
                              cap: int | None = None,
                              interpret: bool = False) -> jax.Array:
    """Strip-partitioned K-tap graph filter over a sharded agent axis.

    Args:
      x: node signals [N, G], sharded on axis 0; agents must be ordered by
        :func:`strip_partition` of their positions.
      pos: agent positions [N, 2] in the same order.
      radius: communication radius (scalar).
      weights: [K, G, F] replicated filter taps; bias: optional [F].

    Returns [N, F] sharded on axis 0. Per-chip collective volume per hop is
    2*(N/d)*G elements regardless of d (vs N*G for the all_gather path).
    """
    num_shards = mesh.shape[axis]
    if x.shape[0] % num_shards:
        raise ValueError(
            f"agent count {x.shape[0]} must divide evenly across the "
            f"{num_shards}-way '{axis}' mesh axis")
    r = jnp.asarray(radius, jnp.float32)
    if bias is None:
        bias = jnp.zeros((weights.shape[2],), x.dtype)

    def body(x_loc, pos_loc, w, b):
        return halo_filter_body(x_loc, pos_loc, r, w, b, axis, num_shards,
                                geometric=geometric, cap=cap,
                                interpret=interpret)

    # the pallas interpreter/lowering cannot yet mix varying operands with
    # invariant grid indices (same workaround as swarm_rollout).
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P()),
        out_specs=P(axis, None), check_vma=not geometric)(
            x, pos, weights, bias)
