"""End-to-end MAPF case-pool generation: maps -> cases -> expert -> records.

Capability parity with the reference's two-stage pipeline
(offlineExpert/CasesSolver.py ``setup_CasePool``/``computeSolution`` +
offlineExpert/DataGen_Transformer.py ``solutionTransformer``), collapsed into
one driver: generate maze maps, sample start/goal pools, solve with the
native C++ expert (process pool), and write compact ``.npz`` CaseRecords
into the reference's directory scheme
``{map_type}{W:02d}x{H:02d}_density_p{label}/{N}_Agent/{split}/``
(Dataloader_dcplocal_notTF_onlineExpert.py:71-74) with the reference's
``*_MP{makespan}`` filename suffix (:216).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from .mapgen import generate_map, random_start_goal_pairs
from .solvers import ExpertSolver
from .transform import (CaseRecord, agent_hash_ids,
                        record_from_solution, save_record)


@dataclasses.dataclass
class CasePool:
    grids: list[np.ndarray]
    starts: list[np.ndarray]
    goals: list[np.ndarray]
    map_ids: list[int]
    case_ids: list[int]


def dataset_dir(root: str | Path, map_w: int, map_h: int, density_label: int,
                num_agents: int, split: str, map_type: str = "map") -> Path:
    return (Path(root) / f"{map_type}{map_w:02d}x{map_h:02d}_density_p{density_label}"
            / f"{num_agents}_Agent" / split)


def save_map_png(grid: np.ndarray, path: str | Path) -> None:
    """Render a generated map as a PNG (the reference's mapSet/ export,
    CasesSolver.py:384-388: 200x200 px, obstacles black on white)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(2, 2), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.imshow(grid.T, cmap="gray_r", origin="lower", interpolation="nearest")
    ax.set_axis_off()
    fig.savefig(path)
    plt.close(fig)


def export_map_set(pool: CasePool, out_root: str | Path) -> int:
    """Write one ``mapSet/IDMap{m:05d}.png`` per distinct map in the pool
    (reference dirName_mapSet scheme, CasesSolver.py:101,384)."""
    out = Path(out_root) / "mapSet"
    out.mkdir(parents=True, exist_ok=True)
    seen: set[int] = set()
    for grid, m in zip(pool.grids, pool.map_ids):
        if m in seen:
            continue
        seen.add(m)
        save_map_png(np.asarray(grid), out / f"IDMap{m:05d}.png")
    return len(seen)


def generate_case_pool(num_maps: int, cases_per_map: int, map_w: int,
                       map_h: int, num_agents: int, complexity: float = 0.01,
                       density: float = 0.1, seed: int = 1337,
                       map_type: str = "map") -> CasePool:
    """Random maps + per-map case sets (CasesSolver.py:234-351 semantics).
    ``map_type`` picks the obstacle family: "map"/"maze" = maze walks,
    "random" = uniform obstacles (the BMAP benchmark family)."""
    from .mapgen import generate_random_map
    rng = np.random.RandomState(seed)
    pool = CasePool([], [], [], [], [])
    for m in range(num_maps):
        if map_type == "random":
            grid = generate_random_map(map_w, map_h, density, rng)
        else:
            grid = generate_map(map_w, map_h, complexity, density, rng)
        for c in range(cases_per_map):
            sg = random_start_goal_pairs(grid, num_agents, rng)
            if sg is None:
                continue
            pool.grids.append(grid)
            pool.starts.append(sg[0])
            pool.goals.append(sg[1])
            pool.map_ids.append(m)
            pool.case_ids.append(c)
    return pool


def solve_and_save(pool: CasePool, out_dir: str | Path, split: str,
                   algo: str = "ecbs", w: float = 1.1, comm_radius: float = 6.0,
                   workers: int = 4, timeout: float = 300.0,
                   min_makespan: int = 1) -> int:
    """Solve every case in the pool and persist successful ones as
    ``{split}_IDMap{m}_IDCase{c}_MP{makespan}.npz``. Returns #saved.

    Solver failures/timeouts are skipped silently — reference semantics
    (ECBS_onlineExpert.py:103-104)."""
    out = Path(out_dir) / split
    out.mkdir(parents=True, exist_ok=True)
    solver = ExpertSolver(algo=algo, w=w, timeout=timeout, workers=workers)
    results = solver.solve_batch(pool.grids, pool.starts, pool.goals)
    saved = 0
    for res, grid, goals, m, c in zip(results, pool.grids, pool.goals,
                                      pool.map_ids, pool.case_ids):
        if not res.ok or res.paths is None:
            continue
        schedule = res.schedule_array()
        if schedule.shape[0] - 1 < min_makespan:
            continue  # degenerate: everyone already at goal
        rec = record_from_solution(grid, goals, schedule, comm_radius)
        rec.hash_ids = agent_hash_ids(m, c, rec.num_agents)
        save_record(out / f"{split}_IDMap{m}_IDCase{c}_MP{rec.makespan}.npz",
                    rec)
        saved += 1
    return saved


def generate_dataset(root: str | Path, map_w: int = 20, map_h: int = 20,
                     num_agents: int = 10, density_label: int = 1,
                     splits: dict[str, tuple[int, int]] | None = None,
                     algo: str = "ecbs", complexity: float = 0.01,
                     density: float = 0.1, comm_radius: float = 6.0,
                     workers: int = 4, seed: int = 1337,
                     map_type: str = "map",
                     timeout: float = 300.0,
                     export_maps: bool = False) -> dict[str, int]:
    """Full dataset generation. ``splits`` maps split name ->
    (num_maps, cases_per_map); defaults to a small smoke-scale set.
    ``export_maps`` also writes mapSet/IDMap*.png images per split
    (CasesSolver.py:384)."""
    splits = splits or {"train": (4, 8), "valid": (1, 4), "test": (1, 4)}
    counts = {}
    for i, (split, (n_maps, n_cases)) in enumerate(splits.items()):
        pool = generate_case_pool(n_maps, n_cases, map_w, map_h, num_agents,
                                  complexity, density, seed + 7919 * i,
                                  map_type=map_type)
        base = dataset_dir(root, map_w, map_h, density_label, num_agents,
                           split, map_type).parent
        if export_maps:
            export_map_set(pool, base)
        counts[split] = solve_and_save(pool, base, split, algo=algo,
                                       comm_radius=comm_radius,
                                       workers=workers, timeout=timeout)
    return counts
