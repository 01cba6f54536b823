"""Rollout artifact export for the animation/analysis pipeline.

Capability parity with the reference's ``save_success_cases``
(/root/reference/utils/multirobotsim_dcenlocal.py:734-819): for each case it
writes the input problem YAML (map + agents), the predicted-schedule YAML and
the expert-target-schedule YAML (statistics + schedule), and the per-step
GSO sequence — the exact artifacts ``utils/visualize.py`` consumes. GSOs are
stored as ``.npz`` instead of ``.mat`` (viz.animate reads both arrays the
same way); an optional ``.mat`` mirror keeps drop-in compatibility with the
reference's visualizer.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..data.solvers import write_case_yaml


def write_schedule_yaml(path: str | Path, schedule: np.ndarray,
                        cost: int, makespan: int,
                        succeed: bool | None = None) -> None:
    """schedule: [T+1, N, 2] positions -> reference output-YAML format
    (multirobotsim_dcenlocal.py:777-798; the OE variant adds ``succeed``)."""
    t_max, n, _ = schedule.shape
    with open(path, "w") as f:
        f.write("statistics:\n")
        f.write(f"    cost: {int(cost)}\n")
        f.write(f"    makespan: {int(makespan)}\n")
        if succeed is not None:
            f.write(f"    succeed: {bool(succeed)}\n")
        f.write("schedule:\n")
        for a in range(n):
            f.write(f"    agent{a}:\n")
            for t in range(t_max):
                f.write(f"       - x: {int(schedule[t, a, 0])}\n"
                        f"         y: {int(schedule[t, a, 1])}\n"
                        f"         t: {t}\n")


def save_rollout_case(out_dir: str | Path, case_id: int, mode: str,
                      grid: np.ndarray, starts: np.ndarray,
                      goals: np.ndarray, predicted_paths: np.ndarray,
                      metrics, target_schedule: np.ndarray | None = None,
                      gso_seq: np.ndarray | None = None,
                      comm_radius: float | None = None,
                      mat_mirror: bool = False) -> dict[str, Path]:
    """Write the full artifact set for one rolled-out case.

    Args:
      mode: 'success' or 'failure' (reference file naming).
      predicted_paths: [T+1, N, 2] from rollout(record_paths=True).
      metrics: the case's RolloutMetrics (scalars).
      target_schedule: optional expert schedule [T+1, N, 2].
      gso_seq: optional [T, N, N] per-step GSOs.

    Returns dict of artifact name -> path.
    """
    out = Path(out_dir)
    for sub in ("input", "predict", "target", "GSO"):
        (out / sub).mkdir(parents=True, exist_ok=True)
    stem = f"{mode}Cases_ID{case_id:05d}"
    paths: dict[str, Path] = {}

    p = out / "input" / f"{stem}.yaml"
    write_case_yaml(p, grid, starts, goals)
    paths["input"] = p

    p = out / "predict" / f"{stem}.yaml"
    write_schedule_yaml(p, predicted_paths,
                        cost=int(metrics.flowtime_predict),
                        makespan=int(metrics.makespan_predict),
                        succeed=bool(metrics.all_reached))
    paths["predict"] = p

    if target_schedule is not None:
        p = out / "target" / f"{stem}.yaml"
        write_schedule_yaml(p, target_schedule,
                            cost=int(metrics.flowtime_target),
                            makespan=int(metrics.makespan_target))
        paths["target"] = p

    if gso_seq is not None:
        p = out / "GSO" / f"{stem}.npz"
        np.savez_compressed(p, gso=gso_seq,
                            commRadius=np.float64(comm_radius or 0.0))
        paths["gso"] = p
        if mat_mirror:
            import scipy.io as sio
            pm = out / "GSO" / f"{stem}.mat"
            sio.savemat(pm, {"gso": gso_seq,
                             "commRadius": comm_radius or 0.0})
            paths["gso_mat"] = pm
    return paths


def gso_sequence_from_paths(paths: np.ndarray, radius: float) -> np.ndarray:
    """Recompute the per-step normalized GSOs for a recorded trajectory
    ([T+1, N, 2] -> [T, N, N]) — deterministic rebuild from positions, same
    as the training-data GSOs."""
    import jax
    import jax.numpy as jnp
    from ..ops.gso import adjacency_from_positions, normalize_adjacency

    def one(pos):
        w = adjacency_from_positions(pos.astype(jnp.float32),
                                     jnp.float32(radius))
        return normalize_adjacency(w)

    return np.asarray(jax.vmap(one)(jnp.asarray(paths[:-1])))
