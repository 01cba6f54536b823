"""Graph shift operator (GSO) construction.

Capability parity with the reference's per-step adjacency pipeline
(/root/reference/utils/multirobotsim_dcenlocal.py:320-365 ``computeAdjacencyMatrix``
and /root/reference/utils/graphUtils/graphTools.py:396-423 ``isConnected``),
re-designed for TPU:

- Connectivity is decided by O(log N) boolean reachability doublings
  (matmuls on the MXU) instead of the reference's O(N^3) dense
  eigendecomposition of the Laplacian — same answer, jit-compilable, and
  orders of magnitude cheaper at large N.
- The t=0 communication-radius growth loop (``r /= 1.1; while not connected:
  r *= 1.1`` — multirobotsim_dcenlocal.py:334-340) becomes a bounded
  ``lax.while_loop`` so it lives inside the compiled rollout step.
- Symmetric degree normalization ``D^-1/2 W D^-1/2`` with zero-degree guard
  matches the reference bit-for-bit (zero-degree nodes get zero rows/cols).

All functions are pure and jit/vmap-friendly; shapes are static in N.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Growth loop safety bound: radius grows 1.1x per iteration; 200 iterations
# covers > 10^8x growth, far beyond any finite map diagonal.
_MAX_GROWTH_ITERS = 200


def pairwise_distances(pos: jax.Array) -> jax.Array:
    """Euclidean distance matrix for positions ``[N, 2]`` -> ``[N, N]``."""
    diff = pos[:, None, :] - pos[None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(sq.astype(jnp.float32))


def adjacency_from_positions(pos: jax.Array, radius: jax.Array) -> jax.Array:
    """Unweighted adjacency: 1 where distance < radius, zero diagonal.

    Strict inequality matches the reference
    (multirobotsim_dcenlocal.py:338 ``distances < communicationRadius``).
    """
    n = pos.shape[0]
    d = pairwise_distances(pos)
    w = (d < radius).astype(jnp.float32)
    return w * (1.0 - jnp.eye(n, dtype=jnp.float32))


def is_connected(w: jax.Array) -> jax.Array:
    """Whether the (symmetrized) graph is connected.

    Boolean reachability closure by repeated squaring of (I + A): after
    ceil(log2(N)) doublings, reach[0, j] covers all paths of length <= N.
    Equivalent to the reference's Laplacian-eigenvalue count
    (graphTools.py:396-423) for deciding single-component-ness.
    """
    n = w.shape[0]
    a = ((w + w.T) > 0).astype(jnp.float32) + jnp.eye(n, dtype=jnp.float32)
    reach = jnp.minimum(a, 1.0)
    n_doublings = max(1, (n - 1).bit_length())
    for _ in range(n_doublings):
        reach = jnp.minimum(reach @ reach, 1.0)
    return jnp.all(reach[0] > 0)


def normalize_adjacency(w: jax.Array, zero_tolerance: float = 1e-9) -> jax.Array:
    """Symmetric degree normalization ``D^-1/2 W D^-1/2``.

    Zero-degree nodes produce zero rows/columns, matching the reference's
    guard (multirobotsim_dcenlocal.py:342-348: zero degrees are replaced by 1
    before the sqrt-inverse and then the inverse is zeroed out).
    """
    deg = jnp.sum(w, axis=-1)
    zero = jnp.abs(deg) < zero_tolerance
    inv_sqrt = jnp.where(zero, 0.0, 1.0 / jnp.sqrt(jnp.where(zero, 1.0, deg)))
    return w * inv_sqrt[:, None] * inv_sqrt[None, :]


def grow_radius_until_connected(pos: jax.Array, radius: jax.Array):
    """t=0 radius schedule: shrink by 1.1, then grow 1.1x until connected.

    Mirrors multirobotsim_dcenlocal.py:334-340. Returns ``(radius, w)`` where
    ``w`` is the unnormalized adjacency at the final radius. Bounded to
    ``_MAX_GROWTH_ITERS`` growth steps for compile-time safety.
    """
    radius = jnp.asarray(radius, jnp.float32) / 1.1

    def cond(state):
        r, _, connected, it = state
        return jnp.logical_and(~connected, it < _MAX_GROWTH_ITERS)

    def body(state):
        r, _, _, it = state
        r = r * 1.1
        w = adjacency_from_positions(pos, r)
        return r, w, is_connected(w), it + 1

    n = pos.shape[0]
    init = (radius, jnp.zeros((n, n), jnp.float32), jnp.asarray(False), 0)
    radius, w, _, _ = jax.lax.while_loop(cond, body, init)
    return radius, w


@partial(jax.jit, static_argnames=("grow",))
def compute_gso(pos: jax.Array, radius: jax.Array, grow: bool = False):
    """Full per-step GSO: adjacency -> (optional radius growth) -> normalize.

    Args:
      pos: agent positions ``[N, 2]`` (any real dtype).
      radius: communication radius (scalar).
      grow: if True, apply the t=0 connect-growth loop; the returned radius is
        then carried to subsequent steps (reference keeps the grown radius
        fixed for the remainder of a rollout).

    Returns:
      ``(s, radius, connected)``: normalized GSO ``[N, N]`` float32, the
      (possibly grown) radius, and the connectivity flag.
    """
    pos = pos.astype(jnp.float32)
    if grow:
        radius, w = grow_radius_until_connected(pos, radius)
    else:
        w = adjacency_from_positions(pos, radius)
    connected = is_connected(w)
    return normalize_adjacency(w), radius, connected
