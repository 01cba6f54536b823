import numpy as np
import jax.numpy as jnp

from gnn_pathplanning_tpu.ops import render_fov


def oracle_fov(grid, pos, goal):
    """Independent numpy oracle for the reference AgentState semantics:
    9x9 crop (map padded with obstacle=1, occupancy padded with 0) plus a
    1-cell zero border -> 11x11; goal one-hot in window or projected onto
    the window boundary via the arctan2 octant rule."""
    n = pos.shape[0]
    fw, dist, center = 4, 5, 5
    map_pad = np.pad(grid, fw, constant_values=1)
    occ = np.zeros_like(grid)
    for a in range(n):
        occ[pos[a, 0], pos[a, 1]] = 1
    occ_pad = np.pad(occ, fw, constant_values=0)

    out = np.zeros((n, 3, 11, 11), np.float32)
    for a in range(n):
        x, y = pos[a]
        gx, gy = goal[a]
        out[a, 0] = np.pad(map_pad[x:x + 9, y:y + 9], 1, constant_values=0)
        out[a, 2] = np.pad(occ_pad[x:x + 9, y:y + 9], 1, constant_values=0)
        dx, dy = float(gx - x), float(gy - y)
        ch = np.zeros((11, 11), np.float32)
        if abs(dx) <= 4 and abs(dy) <= 4:
            ch[int(dx) + center, int(dy) + center] = 1
        else:
            angle = np.arctan2(dy, dx)
            if (np.pi / 4 <= angle <= 3 * np.pi / 4) or (-3 * np.pi / 4 <= angle <= -np.pi / 4):
                gj = int(dist * (np.sign(dy) + 1))
                gi = int(center + np.round(dist * dx / abs(dy)))
            else:
                gi = int(dist * (np.sign(dx) + 1))
                gj = int(center + np.round(dist * dy / abs(dx)))
            ch[gi, gj] = 1
        out[a, 1] = ch
    return out


def _run(grid, pos, goal):
    got = np.asarray(render_fov(jnp.array(grid, jnp.float32),
                                jnp.array(pos, jnp.int32),
                                jnp.array(goal, jnp.int32)))
    want = oracle_fov(grid, pos, goal)
    np.testing.assert_array_equal(got, want)


def test_random_cases_match_oracle(rng):
    for _ in range(10):
        w = h = 20
        grid = (rng.rand(w, h) < 0.1).astype(np.float32)
        n = 10
        free = np.argwhere(grid == 0)
        idx = rng.choice(len(free), size=2 * n, replace=False)
        pos = free[idx[:n]]
        goal = free[idx[n:]]
        _run(grid, pos, goal)


def test_corner_agent_sees_obstacle_border():
    grid = np.zeros((12, 12), np.float32)
    pos = np.array([[0, 0]])
    goal = np.array([[11, 11]])
    out = np.asarray(render_fov(jnp.array(grid), jnp.array(pos), jnp.array(goal)))
    # Outer ring of the 11x11 is always 0 (the border pad).
    assert np.all(out[0, 0, 0, :] == 0) and np.all(out[0, 0, :, 0] == 0)
    # Inside the ring, out-of-map cells (rows/cols beyond the grid) read as 1.
    assert np.all(out[0, 0, 1:5, 1:10] == 1)  # x in [-4,-1] off-map
    assert np.all(out[0, 0, 1:10, 1:5] == 1)
    assert np.all(out[0, 0, 5:10, 5:10] == 0)  # on-map free cells
    _run(grid, pos, goal)


def test_goal_projection_octants():
    grid = np.zeros((40, 40), np.float32)
    pos = np.tile(np.array([[20, 20]]), (8, 1))
    # 8 directions, all out of FOV
    offs = np.array([[10, 0], [-10, 0], [0, 10], [0, -10],
                     [10, 10], [-10, -10], [10, -10], [-7, 10]])
    goal = pos + offs
    _run(grid, pos, goal)


def test_goal_on_fov_edge_not_projected():
    grid = np.zeros((20, 20), np.float32)
    pos = np.array([[10, 10]])
    goal = np.array([[14, 6]])  # exactly at FOV corner (|dx|=|dy|=4)
    out = np.asarray(render_fov(jnp.array(grid), jnp.array(pos), jnp.array(goal)))
    assert out[0, 1, 9, 1] == 1 and out[0, 1].sum() == 1
    _run(grid, pos, goal)


def test_self_visible_in_occupancy():
    grid = np.zeros((20, 20), np.float32)
    pos = np.array([[5, 5], [5, 7]])
    goal = np.array([[6, 6], [7, 7]])
    out = np.asarray(render_fov(jnp.array(grid), jnp.array(pos), jnp.array(goal)))
    assert out[0, 2, 5, 5] == 1      # self at center
    assert out[0, 2, 5, 7] == 1      # neighbor within FOV
    _run(grid, pos, goal)


def test_grid_mode_matches_pairwise(rng):
    """The swarm-scale grid-scatter occupancy path (auto-selected above
    _PAIRWISE_MAX_PAIRS window-occupant pairs, where the pairwise [N, M, 9]
    operands outgrow HBM) must be bit-identical to the pairwise path —
    every crop contraction is against a one-hot, so bf16 selects single
    0/1 values exactly. Also exercises halo-style occupancy_pos (occupants
    a superset of the rendered agents)."""
    w = h = 48
    grid = (rng.rand(w, h) < 0.12).astype(np.float32)
    free = np.argwhere(grid == 0)
    m, n = 120, 40
    idx = rng.choice(len(free), size=m + n, replace=False)
    occ_pos = free[idx[:m]]
    pos = occ_pos[:n]                      # rendered agents are a subset
    goal = free[idx[m:]]
    args = (jnp.array(grid, jnp.float32), jnp.array(pos, jnp.int32),
            jnp.array(goal, jnp.int32))
    pairwise = np.asarray(render_fov(*args, occupancy_pos=occ_pos,
                                     occupancy_mode="pairwise"))
    gridmode = np.asarray(render_fov(*args, occupancy_pos=occ_pos,
                                     occupancy_mode="grid"))
    np.testing.assert_array_equal(gridmode, pairwise)


def test_grid_mode_chunked_crop(rng, monkeypatch):
    """Chunked lax.map crop (N > _CROP_CHUNK, with a non-dividing
    remainder) equals the unchunked grid path."""
    from gnn_pathplanning_tpu.ops import fov as fov_mod
    w = h = 30
    grid = (rng.rand(w, h) < 0.1).astype(np.float32)
    free = np.argwhere(grid == 0)
    n = 50
    idx = rng.choice(len(free), size=2 * n, replace=False)
    pos, goal = free[idx[:n]], free[idx[n:]]
    args = (jnp.array(grid, jnp.float32), jnp.array(pos, jnp.int32),
            jnp.array(goal, jnp.int32))
    whole = np.asarray(render_fov(*args, occupancy_mode="grid"))
    monkeypatch.setattr(fov_mod, "_CROP_CHUNK", 16)  # 50 = 3*16 + 2
    chunked = np.asarray(render_fov(*args, occupancy_mode="grid"))
    np.testing.assert_array_equal(chunked, whole)
