"""Random map and start/goal generation for MAPF case pools.

Capability parity with the reference's case generator
(/root/reference/offlineExpert/CasesSolver.py:149-193 ``mapGen``,
:190-210 ``img_fill``, :262-351 ``setup_cases``), with the OpenCV flood fill
replaced by a numpy BFS (no cv2 dependency):

- Maze-style obstacle generation: seed obstacle components on the even
  subgrid and random-walk them outward, with complexity/density scaled to
  map size exactly as the reference scales them.
- Connectivity repair: free cells unreachable from the map center are
  converted to obstacles (the reference flood-fills from (W/2, H/2) and ORs
  the unreached inverse into the obstacle mask — same effect).
- Start/goal sampling: two distinct free cells per agent, cases rejected if
  any two agents share a start or share a goal (CasesSolver.py:313-330).
"""
from __future__ import annotations

from collections import deque

import numpy as np


def maze_obstacles(width: int, height: int, complexity: float = 0.01,
                   density: float = 0.1,
                   rng: np.random.RandomState | None = None) -> np.ndarray:
    """Generate a raw maze obstacle grid [height, width] (1 = obstacle)."""
    rng = rng or np.random.RandomState()
    n_steps = int(complexity * (5 * (height + width)))      # component length
    n_components = int(density * ((height // 2) * (width // 2)))
    maze = np.zeros((height, width), np.int64)
    for _ in range(n_components):
        x = rng.randint(0, max(1, width // 2)) * 2
        y = rng.randint(0, max(1, height // 2)) * 2
        maze[y, x] = 1
        for _ in range(n_steps):
            neighbours = []
            if x > 1:
                neighbours.append((y, x - 2))
            if x < width - 2:
                neighbours.append((y, x + 2))
            if y > 1:
                neighbours.append((y - 2, x))
            if y < height - 2:
                neighbours.append((y + 2, x))
            if neighbours:
                y2, x2 = neighbours[rng.randint(0, max(1, len(neighbours) - 1))]
                if maze[y2, x2] == 0:
                    maze[y2, x2] = 1
                    maze[y2 + (y - y2) // 2, x2 + (x - x2) // 2] = 1
                    x, y = x2, y2
    return maze


def fill_unreachable(grid: np.ndarray) -> np.ndarray:
    """Mark free cells not 4-connected to the center cell as obstacles."""
    h, w = grid.shape
    out = (grid > 0).astype(np.int64)
    cy, cx = h // 2, w // 2
    if out[cy, cx]:
        # center blocked: flood from the first free cell instead
        free = np.argwhere(out == 0)
        if len(free) == 0:
            return out
        cy, cx = free[0]
    seen = np.zeros_like(out, bool)
    q = deque([(cy, cx)])
    seen[cy, cx] = True
    while q:
        y, x = q.popleft()
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx] and not out[ny, nx]:
                seen[ny, nx] = True
                q.append((ny, nx))
    out[(out == 0) & ~seen] = 1
    return out


def generate_map(width: int, height: int, complexity: float = 0.01,
                 density: float = 0.1,
                 rng: np.random.RandomState | None = None) -> np.ndarray:
    """Maze map with a single connected free region; retries until both free
    space and obstacles exist (CasesSolver.py:255-260)."""
    rng = rng or np.random.RandomState()
    for _ in range(100):
        grid = fill_unreachable(maze_obstacles(width, height, complexity,
                                               density, rng))
        if 0 < grid.sum() < grid.size:
            return grid
    return grid


def generate_random_map(width: int, height: int, density: float = 0.1,
                        rng: np.random.RandomState | None = None) -> np.ndarray:
    """Uniform-random obstacle map with a single connected free region — the
    statistical family of the MovingAI ``random-W-H-10`` benchmark maps the
    reference's BMAP configs load (CasesSolver.py:215-232 via
    ``--loadmap_TYPE random``; e.g. the 40x40/64-agent generalization test,
    scripts/test_general_dcpOE_best_K3.sh). When the benchmark files
    themselves are available, use :func:`load_movingai_map` instead."""
    rng = rng or np.random.RandomState()
    for _ in range(100):
        grid = fill_unreachable(
            (rng.random_sample((height, width)) < density).astype(np.int64))
        if 0 < grid.sum() < grid.size:
            return grid
    return grid


def load_movingai_map(path) -> np.ndarray:
    """Load a MovingAI-benchmark ``.map`` file (the format consumed by the
    reference's ``load_benchmarkMap``, CasesSolver.py:215-232): header lines
    ``type/height/width/map`` then rows where '@'/'T' are obstacles."""
    with open(path) as f:
        f.readline()                                   # type octile
        height = int(f.readline().split("height")[-1])
        width = int(f.readline().split("width")[-1])
        f.readline()                                   # "map"
        grid = np.zeros((height, width), np.int64)
        for h in range(height):
            row = f.readline().rstrip("\n")
            for w in range(min(width, len(row))):
                if row[w] in "@T":
                    grid[h, w] = 1
    return grid


def random_start_goal_pairs(grid: np.ndarray, num_agents: int,
                            rng: np.random.RandomState | None = None,
                            max_tries: int = 1000):
    """Sample per-agent (start, goal) pairs on free cells; no two agents may
    share a start or share a goal. Returns (starts [N,2], goals [N,2]) or
    None when the map cannot host the agents."""
    rng = rng or np.random.RandomState()
    free = np.argwhere(grid == 0)
    if len(free) < 2 * num_agents and len(free) < num_agents + 1:
        return None
    for _ in range(max_tries):
        starts, goals = [], []
        ok = True
        for _ in range(num_agents):
            idx = rng.choice(len(free), size=2, replace=False)
            starts.append(free[idx[0]])
            goals.append(free[idx[1]])
        s = {tuple(p) for p in starts}
        g = {tuple(p) for p in goals}
        if len(s) == num_agents and len(g) == num_agents:
            return np.array(starts, np.int32), np.array(goals, np.int32)
    return None
