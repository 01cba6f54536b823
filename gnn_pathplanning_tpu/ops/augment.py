"""D4 symmetry augmentation for MAPF imitation samples.

The MAPF problem on a square grid is equivariant under the dihedral group
D4 (4 rotations x optional flip): transforming the map, agent positions and
goals by a group element and permuting the action labels accordingly yields
another valid problem whose expert solution is the transformed trajectory.
The reference trains on raw expert states only
(/root/reference/agents/decentralplannerlocal.py:276-326); this framework
adds the augmentation as a training-time option (8x effective data) because
observations are rendered on device from ``(grid, pos, goals)``, so the
transform is a handful of gathers inside the jitted train step.

Conventions (array indices ``(row, col)`` on a ``W x W`` grid):
- ``g in [0, 8)``: ``k = g % 4`` counter-clockwise ``rot90`` steps followed by
  an up-down flip when ``g >= 4``.
- point transform for one rot90 step: ``(r, c) -> (W-1-c, r)`` (matches
  ``np.rot90``); flip: ``(r, c) -> (W-1-r, c)``.
- action deltas in the reference order [up, left, down, right, stop]
  (multirobotsim_dcenlocal.py:22-26); the label permutation is derived from
  the linear part of the transform.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..env.simulator import DELTAS as _SIM_DELTAS

# Single source of truth for the action order/deltas
# (env/simulator.py DELTAS, reference multirobotsim_dcenlocal.py:22-26) —
# the label permutation below MUST match what the simulator executes.
_DELTAS = np.asarray(_SIM_DELTAS, np.int32)


def _linear(g: int, d: np.ndarray) -> np.ndarray:
    """Linear part of group element ``g`` applied to delta ``d``."""
    for _ in range(g % 4):
        d = np.array([-d[1], d[0]])      # rot90: (dr, dc) -> (-dc, dr)
    if g >= 4:
        d = np.array([-d[0], d[1]])      # flipud: (dr, dc) -> (-dr, dc)
    return d


def _perm_table() -> np.ndarray:
    table = np.zeros((8, len(_DELTAS)), np.int32)
    for g in range(8):
        for a, d in enumerate(_DELTAS):
            nd = _linear(g, d)
            (idx,) = np.nonzero((_DELTAS == nd).all(axis=1))
            table[g, a] = idx[0]
    return table


# ACTION_PERM[g, a] = label of action ``a`` after transform ``g``.
# Kept as NUMPY on purpose: this module is imported lazily inside the first
# train_step trace (trainer.py make_train_step), and a module-level jnp
# constant created during tracing becomes a tracer owned by that trace —
# baked in silently on single-shape runs, UnexpectedTracerError on the
# first retrace (observed launching the mixed-distribution leg, whose
# second component shape retraces). jnp.asarray at use site is free: it
# becomes a fresh constant in each trace.
ACTION_PERM = _perm_table()


def _points(p: jax.Array, w: int, k: int, flip: bool) -> jax.Array:
    """Transform integer points ``[..., 2]`` by group element (k, flip)."""
    for _ in range(k):
        p = jnp.stack([w - 1 - p[..., 1], p[..., 0]], axis=-1)
    if flip:
        p = jnp.stack([w - 1 - p[..., 0], p[..., 1]], axis=-1)
    return p


def apply_d4(grid: jax.Array, pos: jax.Array, goals: jax.Array,
             actions: jax.Array, g: jax.Array):
    """Apply D4 element ``g`` (scalar int32 in [0, 8)) to one sample.

    Args:
      grid: ``[W, W]`` obstacle map (square — callers must not request
        augmentation on rectangular maps).
      pos / goals: integer points ``[..., 2]``.
      actions: integer labels (any shape) in the reference order.
      g: scalar group element.

    Returns:
      ``(grid, pos, goals, actions)`` transformed consistently.
    """
    w, h = grid.shape
    assert w == h, "D4 augmentation requires square maps"

    def branch(k: int, flip: bool):
        def fn(grid, pos, goals):
            gr = jnp.rot90(grid, k)
            gr = jnp.flipud(gr) if flip else gr
            return gr, _points(pos, w, k, flip), _points(goals, w, k, flip)
        return fn

    branches = [branch(k, f) for f in (False, True) for k in range(4)]
    grid, pos, goals = jax.lax.switch(g, branches, grid, pos, goals)
    return grid, pos, goals, jnp.asarray(ACTION_PERM)[g, actions]


def augment_batch(key: jax.Array, grids: jax.Array, goals: jax.Array,
                  pos: jax.Array, actions: jax.Array):
    """Per-sample random D4 transform over a batch (leading axis B)."""
    g = jax.random.randint(key, (grids.shape[0],), 0, 8)
    grids, pos, goals, actions = jax.vmap(apply_d4)(grids, pos, goals,
                                                    actions, g)
    return grids, goals, pos, actions
