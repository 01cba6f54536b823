"""Swarm-scale agent partitioning: K-hop halo exchange over the mesh.

The reference's scaling hazard is the dense N x N GSO rebuilt every step with
an O(N^3) eigendecomposition (SURVEY §2.3 / §5 "long-context"). At swarm
scale we shard the *agent* axis across chips: each shard owns N/d agents'
features and its column block of the GSO. One K-tap graph filter then needs
K-1 neighbor-feature exchanges — the direct analog of ring-attention's
neighbor passing — expressed here as `all_gather` over the "agents" mesh
axis inside `shard_map`, riding ICI.

All functions are written per-sample ([N, ...]) and `vmap` over batch
composes with the shard_map.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def graph_filter_sharded(mesh: Mesh, x: jax.Array, s: jax.Array,
                         weights: jax.Array, bias: jax.Array | None = None,
                         axis: str = "agents") -> jax.Array:
    """K-tap graph filter with the agent axis sharded over ``axis``.

    Args:
      x: node signals [N, G]; sharded on axis 0.
      s: GSO [N, N]; sharded on axis 1 (each shard holds the columns of its
         local agents — i.e. incoming-edge weights).
      weights: [K, G, F] replicated filter taps.
      bias: optional [F].

    Returns:
      [N, F] sharded on axis 0.

    The contraction matches ops.graph_filter: z[n] = sum_m S[m, n] x[m].
    """
    def body(x_loc, s_cols, w, b):
        return graph_filter_body(x_loc, s_cols, w, b, axis)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P(), P()),
        out_specs=P(axis, None))(x, s, weights, bias)


def graph_filter_body(x_loc: jax.Array, s_cols: jax.Array, w: jax.Array,
                      b: jax.Array | None, axis: str) -> jax.Array:
    """K-tap filter inner body (callable inside any shard_map over ``axis``):
    x_loc [N/d, G], s_cols [N, N/d] -> [N/d, F]."""
    k_taps = w.shape[0]
    zs = [x_loc]
    z = x_loc
    for _ in range(1, k_taps):
        z_full = jax.lax.all_gather(z, axis, tiled=True)   # halo: [N, G]
        z = jnp.einsum("mn,mg->ng", s_cols, z_full)        # [N/d, G]
        zs.append(z)
    stacked = jnp.concatenate(zs, axis=-1)
    y = stacked @ w.reshape(k_taps * w.shape[1], w.shape[2])
    if b is not None:
        y = y + b
    return y


def rollout_gso_sharded(mesh: Mesh, pos: jax.Array, radius: jax.Array,
                        axis: str = "agents") -> jax.Array:
    """Normalized GSO column blocks from agent positions, agents sharded.

    Positions are tiny ([N, 2]) so they are all-gathered whole; each shard
    computes its N x N/d column block and the full degree vector arrives via
    `psum` of the partial row sums — no chip ever materializes the full
    N x N matrix.

    Returns [N, N] sharded on axis 1 (column blocks), matching the layout
    `graph_filter_sharded` expects.
    """

    return shard_map(
        lambda p, r: gso_cols_body(p, r, axis), mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(None, axis))(pos, radius)


def gso_cols_body(pos_loc: jax.Array, r: jax.Array, axis: str) -> jax.Array:
    """Normalized-GSO column-block inner body (callable inside any shard_map
    over ``axis``): pos_loc [N/d, 2] -> [N, N/d]."""
    pos_full = jax.lax.all_gather(pos_loc, axis, tiled=True)  # [N, 2]
    diff = pos_full[:, None, :] - pos_loc[None, :, :]         # [N, N/d, 2]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    w_cols = (dist < r).astype(jnp.float32)                   # [N, N/d]
    # remove self loops: global row index == local col's global index
    n_loc = pos_loc.shape[0]
    shard = jax.lax.axis_index(axis)
    rows = jax.lax.broadcasted_iota(jnp.int32, w_cols.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, w_cols.shape, 1)
    w_cols = jnp.where(rows == cols + shard * n_loc, 0.0, w_cols)
    # full degree: psum of partial row sums (deg[m] = sum_n W[m, n])
    deg = jax.lax.psum(jnp.sum(w_cols, axis=1), axis)          # [N]
    inv = jnp.where(deg > 1e-9, 1.0 / jnp.sqrt(jnp.where(deg > 1e-9, deg, 1.0)), 0.0)
    deg_loc = jax.lax.dynamic_slice_in_dim(inv, shard * n_loc, n_loc)
    return w_cols * inv[:, None] * deg_loc[None, :]
