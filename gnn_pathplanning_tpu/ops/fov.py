"""Field-of-view observation encoding.

Renders each agent's local 3-channel 11x11 observation window — channel order
``[obstacle map, goal, other-agent positions]`` — with semantics matching the
reference's ``AgentState`` (/root/reference/dataloader/statetransformer.py):

- FOV = 9: a 9x9 crop centered on the agent from the global map padded by 4
  cells of obstacle (out-of-bounds reads as obstacle), then a 1-cell border of
  zeros -> 11x11 (statetransformer.py:29-31, 97-104).
- Agent-occupancy channel: every agent marked on the global grid, cropped the
  same way (zero padding; includes the agent itself at the center)
  (statetransformer.py:33-45, 100-101).
- Goal channel: the goal cell if it lies inside the 9x9 FOV; otherwise the
  goal is *projected* onto the boundary of the 11x11 window along the line of
  sight (arctan2 octant logic, statetransformer.py:47-66, 107-115). Rounding
  is round-half-to-even in both numpy and jnp, so projections match exactly.

TPU design: the whole thing is gather/scatter on padded static-shape grids,
``vmap`` over agents (and again over batch) — no Python per-agent loops. The
global grids are built once per step; per-agent work is two 9x9 dynamic
slices plus O(1) goal math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

FOV = 9                 # reference statetransformer.py:11
FOV_WIDTH = FOV // 2    # 4
BORDER = 1
WINDOW = FOV + 2 * BORDER  # 11
_DIST = WINDOW // 2     # 5 — reference self.dist
_CENTER = _DIST         # 5 — reference self.centerX/self.centerY


def _embed(crop9: jax.Array) -> jax.Array:
    """Place a 9x9 crop in the center of an 11x11 zero canvas."""
    return jnp.pad(crop9, BORDER)


def _one_hot_cell(gx: jax.Array, gy: jax.Array) -> jax.Array:
    """11x11 one-hot at integer cell (gx, gy) via iota equality.

    NOT a scatter: at large vmapped batch (44,400 windows — the 4,440-case
    testset) the batched one-hot scatter miscompiles on the TPU backend and
    silently drops the update (goal channel all-zero; reproduced bit-exactly
    across sessions at that shape, correct at <= 24,000 windows). Broadcasted
    comparison is elementwise, shape-independent, and faster on the VPU.
    """
    ii = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, WINDOW), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, WINDOW), 1)
    return ((ii == gx) & (jj == gy)).astype(jnp.float32)


def _round_half_even_ratio(num: jax.Array, den: jax.Array) -> jax.Array:
    """round-half-to-even of ``num / den`` in exact int32 arithmetic
    (den > 0) — matches ``np.round`` of the float quotient for the small
    magnitudes here, without depending on the backend's float-division
    rounding (TPU lowers division to reciprocal-multiply in some fusions)."""
    base = jnp.floor_divide(num, den)
    rem = num - base * den                    # in [0, den)
    twice = 2 * rem
    up = (twice > den) | ((twice == den) & (base % 2 != 0))
    return base + up.astype(base.dtype)


def _projected_goal(dx: jax.Array, dy: jax.Array) -> jax.Array:
    """11x11 one-hot of the out-of-FOV goal projected on the window boundary.

    Mirrors statetransformer.py:47-66. Branch 1 (goal predominantly along y)
    is taken when the bearing angle lies in [pi/4, 3pi/4] or [-3pi/4, -pi/4],
    equivalent to ``|dy| >= |dx| and dy != 0``. All-integer arithmetic: see
    :func:`_one_hot_cell` / :func:`_round_half_even_ratio` for why no float
    division or scatter is used.
    """
    dx = dx.astype(jnp.int32)
    dy = dy.astype(jnp.int32)
    branch_y = jnp.logical_and(jnp.abs(dy) >= jnp.abs(dx), dy != 0)

    # Guard divisors; the selected branch always has a nonzero divisor.
    ady = jnp.maximum(jnp.abs(dy), 1)
    adx = jnp.maximum(jnp.abs(dx), 1)

    gx_y = _CENTER + _round_half_even_ratio(_DIST * dx, ady)
    gy_y = jnp.where(dy > 0, 2 * _DIST, 0)

    # dx == 0 here implies dy == 0 (otherwise branch_y), i.e. the in-FOV
    # path wins the outer select — the dx > 0 test needs no zero case.
    gx_x = jnp.where(dx > 0, 2 * _DIST, 0)
    gy_x = _CENTER + _round_half_even_ratio(_DIST * dy, adx)

    gx = jnp.where(branch_y, gx_y, gx_x)
    gy = jnp.where(branch_y, gy_y, gy_x)
    return _one_hot_cell(gx, gy)


def _goal_channel(pos: jax.Array, goal: jax.Array) -> jax.Array:
    """[11, 11] goal channel for one agent (in-FOV one-hot or projected)."""
    dx = goal[0] - pos[0]
    dy = goal[1] - pos[1]
    in_fov = jnp.logical_and(jnp.abs(dx) <= FOV_WIDTH, jnp.abs(dy) <= FOV_WIDTH)

    # In-FOV goal: one-hot at (dx+5, dy+5) in the 11x11 window (the 9x9 crop
    # index is dx+4, plus the border offset of 1).
    gi = jnp.clip(dx + _CENTER, 0, WINDOW - 1)
    gj = jnp.clip(dy + _CENTER, 0, WINDOW - 1)
    goal_in = _one_hot_cell(gi, gj)
    goal_out = _projected_goal(dx, dy)
    return jnp.where(in_fov, goal_in, goal_out)


# Above this many (window x occupant) pairs the pairwise occupancy path's
# [N, M, 9] operands outgrow HBM (9.7 GB at N=M=32768) and render_fov
# switches to the scatter-grid path. N=M=8192 (603M-element operands) is
# measured FASTER pairwise (benchmarks/swarm_stress_r4b_n8192.json), so the
# cut sits between 8192^2 and 16384^2.
_PAIRWISE_MAX_PAIRS = 100_000_000
# Agent-chunk size for the grid-path crop einsums: bounds the [chunk, 9, Wp]
# one-hot operands (~0.5 GB bf16 at chunk=16384, world 1811) so N=65536
# worlds compile; lax.map pipelines the chunks.
_CROP_CHUNK = 16_384


def _crop_windows_grid(map_pad: jax.Array, occ_pad: jax.Array,
                       pos: jax.Array) -> tuple[jax.Array, jax.Array]:
    """9x9 map + occupancy crops for every agent via one-hot matmuls.

    Each contraction is against a ONE-HOT row/col vector, so every output
    element is a single selected grid value (never a sum) — bit-exact in
    bf16 for the 0/1 grids here, with f32 accumulation requested anyway.
    O(N * 9 * Wp * Hp) MXU work and no [N, M] pairwise operand, which is
    what lets swarm-scale worlds (N >= 32768) compile; the global
    occupancy grid is built by an O(M) scatter instead.
    """
    wp, hp = map_pad.shape
    stacked = jnp.stack([map_pad, occ_pad]).astype(jnp.bfloat16)
    r9 = jnp.arange(FOV, dtype=jnp.int32)
    iw = jnp.arange(wp, dtype=jnp.int32)
    ih = jnp.arange(hp, dtype=jnp.int32)

    def one_chunk(p):
        rows = (p[:, 0:1, None] + r9[None, :, None]
                == iw[None, None, :]).astype(jnp.bfloat16)   # [c, 9, Wp]
        cols = (p[:, 1:2, None] + r9[None, :, None]
                == ih[None, None, :]).astype(jnp.bfloat16)   # [c, 9, Hp]
        tmp = jnp.einsum("nrw,kwh->knrh", rows, stacked,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("knrh,nch->knrc", tmp.astype(jnp.bfloat16), cols,
                          preferred_element_type=jnp.float32)

    n = pos.shape[0]
    if n <= _CROP_CHUNK:
        out = one_chunk(pos)                                 # [2, N, 9, 9]
    else:
        pad = (-n) % _CROP_CHUNK
        p = jnp.pad(pos, ((0, pad), (0, 0)))
        out = jax.lax.map(one_chunk, p.reshape(-1, _CROP_CHUNK, 2))
        out = jnp.moveaxis(out, 1, 0).reshape(2, n + pad, FOV, FOV)[:, :n]
    return out[0], out[1]


def render_fov(grid: jax.Array, pos: jax.Array, goal: jax.Array,
               occupancy_pos: jax.Array | None = None,
               occupancy_mode: str = "auto") -> jax.Array:
    """Render agents' observations for one world state.

    Args:
      grid: global obstacle map ``[W, H]`` (1 = obstacle).
      pos: positions of the agents to render ``[N, 2]`` int32.
      goal: their goals ``[N, 2]`` int32.
      occupancy_pos: positions marked on the other-agents channel; defaults
        to ``pos``. Under agent partitioning pass the all-gathered global
        positions here while rendering only the local shard's agents.
      occupancy_mode: ``"auto"`` (default — pairwise while N*M stays under
        ``_PAIRWISE_MAX_PAIRS`` = 1e8 window-occupant pairs, i.e. up to
        N = M ~ 10000; grid above), ``"pairwise"``, or ``"grid"``. Both
        modes are bit-identical; the grid mode exists because the pairwise
        [N, M, 9] operands grow O(N*M) and are observed to exhaust HBM
        from N = M = 16384 (the auto cut switches earlier, where grid
        already measures faster).

    Returns:
      ``[N, 3, 11, 11]`` float32 observations, channels
      [map, goal, agent positions].

    TPU note (round 4): the original implementation scattered the
    occupancy grid (``zeros.at[pos].set``) and cropped with vmapped
    ``dynamic_slice`` — both lower to scatter/gather, and a step-cost
    decomposition of the driver rollout showed them costing 12.6 ms/step
    at [256 cases x 10 agents], 96% of the whole closed-loop step (network
    0.43 ms, shield 0.06 ms). Both are EXACTLY replaceable by one-hot
    contractions on 0/1 values (products and row-sums of 0/1 are exact in
    f32, and every window row holds at most one hot cell):

    - map crop:  ``crop[n] = rows_onehot[n] @ map_pad @ cols_onehot[n].T``
      — two tiny einsums instead of N gathers.
    - occupancy: agent m lands in agent n's 9x9 window at offset
      ``(pos_m - pos_n) + 4``; a pairwise one-hot outer product summed
      over m builds every crop directly — the global occupancy grid (and
      its scatter) never exists.
    """
    if occupancy_mode not in ("auto", "pairwise", "grid"):
        raise ValueError(f"occupancy_mode must be auto|pairwise|grid, "
                         f"got {occupancy_mode!r}")
    grid = grid.astype(jnp.float32)
    pos = pos.astype(jnp.int32)
    goal = goal.astype(jnp.int32)
    occ_src = pos if occupancy_pos is None else occupancy_pos.astype(jnp.int32)

    map_pad = jnp.pad(grid, FOV_WIDTH, constant_values=1.0)
    wp, hp = map_pad.shape
    if occupancy_mode == "auto":
        pairs = pos.shape[0] * occ_src.shape[0]
        occupancy_mode = "pairwise" if pairs <= _PAIRWISE_MAX_PAIRS else "grid"

    if occupancy_mode == "grid":
        # Swarm scale: O(M) scatter into the padded global grid, then both
        # channels crop via the chunked one-hot matmuls (bit-exact).
        occ_pad = jnp.zeros((wp, hp), jnp.float32).at[
            occ_src[:, 0] + FOV_WIDTH, occ_src[:, 1] + FOV_WIDTH].max(1.0)
        crop_map, crop_occ = _crop_windows_grid(map_pad, occ_pad, pos)
    else:
        # --- map channel: one-hot row/col windows, crop via matmul ---
        r9 = jnp.arange(FOV, dtype=jnp.int32)
        rows = (pos[:, 0:1, None] + r9[None, :, None]
                == jnp.arange(wp, dtype=jnp.int32)[None, None, :])  # [N,9,Wp]
        cols = (pos[:, 1:2, None] + r9[None, :, None]
                == jnp.arange(hp, dtype=jnp.int32)[None, None, :])  # [N,9,Hp]
        crop_map = jnp.einsum("nrw,wh,nch->nrc", rows.astype(jnp.float32),
                              map_pad, cols.astype(jnp.float32))

        # --- occupancy channel: pairwise window offsets, no global grid ---
        rel = occ_src[None, :, :] - pos[:, None, :] + FOV_WIDTH     # [N,M,2]
        rx = (rel[:, :, 0:1] == r9[None, None, :])                  # [N,M,9]
        ry = (rel[:, :, 1:2] == r9[None, None, :])                  # [N,M,9]
        crop_occ = jnp.einsum("nmr,nmc->nrc", rx.astype(jnp.float32),
                              ry.astype(jnp.float32))
        # co-located agents cannot occur (collision-free invariant), but the
        # reference's set() writes 1.0 regardless — clamp to match exactly
        crop_occ = jnp.minimum(crop_occ, 1.0)

    goal_ch = jax.vmap(_goal_channel)(pos, goal)

    pad11 = [(0, 0), (BORDER, BORDER), (BORDER, BORDER)]
    return jnp.stack([jnp.pad(crop_map, pad11), goal_ch,
                      jnp.pad(crop_occ, pad11)], axis=1)
