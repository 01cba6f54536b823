"""Diagnose shield-stall failures (VERDICT r3 next #5).

The round-3 in-dist eval left 342/4440 cases failing with
``rate_notReachGoalSH`` (blocked only by collision shielding — the metric
the reference defines at /root/reference/utils/metrics.py:157). This
script re-rolls the archive's failing cases with ``record_paths=True`` and
clusters the terminal behavior of every non-arrived agent into motifs, so
the next training leg is designed against evidence instead of guesses:

- ``goal_occupied``: another agent is parked on this agent's goal at the
  end (sub-split: the occupier is itself resting on its OWN goal —
  "resting blocker" — or is itself stuck elsewhere).
- ``standoff``: stationary next to another stationary off-goal agent
  (symmetric shield standoff).
- ``oscillation``: period-2 position cycle over the terminal window.
- ``corridor``: stationary with >=2 of 4 neighbor cells walled (obstacle
  or map edge) — narrow-passage blockage.
- ``wandering``: still moving at the horizon but never arrived (a policy
  failure, not a shield artifact).

Usage:
  python scripts/diagnose_stalls.py [--archive artifacts/test_archive_r3.json]
      [--checkpoint <model_selected>] [--pool data2/.../test] [--cpu]
      [--out artifacts/stall_diagnosis_r4.json]
"""
from __future__ import annotations

import argparse
import json
from collections import Counter
from pathlib import Path

import jax
import numpy as np


def classify_case(grid, goals, paths, window=12):
    """Motif labels for one case. paths: [T+1, N, 2] int."""
    t1 = paths.shape[0]
    w, h = grid.shape
    final = paths[-1]
    n = final.shape[0]
    at_goal = (final == goals).all(-1)
    tail = paths[-min(window, t1):]
    motifs = []
    for a in range(n):
        if at_goal[a]:
            continue
        pa = tail[:, a]
        stationary = bool((pa == pa[-1]).all())
        # period-2 cycle: even steps on one cell, odd steps on another
        osc = (not stationary and len(pa) >= 4
               and bool((pa[::2] == pa[0]).all())
               and bool((pa[1::2] == pa[1]).all())
               and not bool((pa[0] == pa[1]).all()))
        labels = []
        # who sits on my goal at the end?
        occ = np.where((final == goals[a]).all(-1))[0]
        occ = occ[occ != a]
        if occ.size:
            b = occ[0]
            labels.append("goal_occupied_resting" if at_goal[b]
                          else "goal_occupied_stuck")
        if stationary:
            # neighbor off-goal stationary agent -> symmetric standoff
            d = np.abs(final - final[a]).sum(-1)
            for b in range(n):
                if b != a and not at_goal[b] and d[b] == 1:
                    pb = tail[:, b]
                    if (pb == pb[-1]).all():
                        labels.append("standoff")
                        break
            # a resting (at-own-goal) agent adjacent, in the goal
            # direction: the classic "parked blocker" motif
            gdir = np.sign(goals[a] - final[a])
            for b in range(n):
                if b != a and at_goal[b] and d[b] == 1:
                    step_to_b = final[b] - final[a]
                    toward = (step_to_b * gdir).sum() > 0
                    labels.append("rester_adjacent_toward_goal" if toward
                                  else "rester_adjacent_side")
                    break
            # corridor: walls on >=2 of the 4 neighbor cells
            x, y = final[a]
            walls = 0
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nx, ny = x + dx, y + dy
                if not (0 <= nx < w and 0 <= ny < h) or grid[nx, ny] > 0:
                    walls += 1
            if walls >= 2:
                labels.append("corridor")
            if not labels:
                labels.append("stationary_isolated")
        elif osc:
            labels.append("oscillation")
        else:
            labels.append("wandering")
        # how much of the episode was spent at the final cell: ~1.0 means
        # the policy converged to "stop" early (imitation gap), small
        # values mean late blockage
        pa_all = paths[:, a]
        at_final = (pa_all == final[a]).all(-1)
        ever_moved = int(np.argmax(at_final)) if not at_final.all() else 0
        stalled_frac = float(at_final[ever_moved:].mean())
        motifs.append({"agent": int(a), "labels": labels,
                       "dist_to_goal": int(np.abs(goals[a] - final[a]).sum()),
                       "stationary": stationary,
                       "stalled_frac": round(stalled_frac, 3)})
    return motifs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--archive", default="artifacts/test_archive_r3.json")
    ap.add_argument("--leg", default="TE_M20x20_10Agent_K3_comR6")
    ap.add_argument("--checkpoint",
                    default="experiments_r2/dcp_map20x20_rho1_10Agent/"
                            "K3_HS0/1787138167/checkpoints/"
                            "model_selected.msgpack")
    ap.add_argument("--pool", default="data2/map20x20_density_p1/10_Agent/test")
    ap.add_argument("--limit", type=int, default=4440)
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="artifacts/stall_diagnosis_r4.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gnn_pathplanning_tpu.data.dataset import load_split
    from gnn_pathplanning_tpu.env.simulator import (SimCase, make_policy,
                                                    rollout_batch)
    from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.train.checkpoint import load_checkpoint
    from gnn_pathplanning_tpu.train.trainer import TrainConfig, Trainer

    arch = json.load(open(args.archive))
    leg = arch["legs"][args.leg]
    fail_idx = np.where(np.array(leg["list_reachGoal"]) == 0)[0]
    print(f"archive leg {args.leg}: {len(fail_idx)} failing cases "
          f"({leg['num_notReachGoalSH']} notReachGoalSH)")

    ds = load_split(args.pool, limit=args.limit)
    model = DCPNet(DCPConfig(num_taps=3))
    trainer = Trainer(model, TrainConfig(), "/tmp/diag_exp", valid_set=ds)
    trainer.state, _ = load_checkpoint(args.checkpoint, trainer.state)

    arrs = ds.sim_cases(limit=args.limit)
    sub = {k: np.asarray(v)[fail_idx] for k, v in arrs.items()}
    cases = SimCase(grid=jnp.asarray(sub["grid"]),
                    starts=jnp.asarray(sub["starts"]),
                    goals=jnp.asarray(sub["goals"]),
                    target_makespan=jnp.asarray(sub["target_makespan"]),
                    target_flowtime=jnp.asarray(sub["target_flowtime"]),
                    solution_makespan=jnp.asarray(sub["solution_makespan"]))
    max_steps = int(np.asarray(arrs["solution_makespan"]).max()) * 2
    out = rollout_batch(make_policy(trainer.model.apply, {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats}), cases, max_steps, 6.0,
        jax.random.PRNGKey(args.seed), 2, record_paths=True)
    jax.block_until_ready(out.paths)
    paths = np.asarray(out.paths)          # [B, T+1, N, 2] (finalize vmap)
    m = jax.tree.map(np.asarray, out.metrics)

    per_case = []
    motif_counts = Counter()
    stuck_per_case = Counter()
    for j, idx in enumerate(fail_idx):
        if bool(m.all_reached[j]):
            per_case.append({"case": int(idx), "repro": "reached_on_replay"})
            continue
        sh = bool(m.no_reach_by_shielding[j])
        motifs = classify_case(sub["grid"][j], sub["goals"][j], paths[j])
        for mm in motifs:
            for lab in mm["labels"]:
                motif_counts[lab] += 1
        stuck_per_case[len(motifs)] += 1
        per_case.append({"case": int(idx), "notReachGoalSH": sh,
                         "num_stuck": len(motifs), "agents": motifs})

    replayed = sum(1 for r in per_case if r.get("repro") == "reached_on_replay")
    summary = {
        "pool": args.pool, "checkpoint": args.checkpoint,
        "archive_fail_cases": len(fail_idx),
        "replay_reached": replayed,
        "replay_still_failing": len(fail_idx) - replayed,
        "motif_counts": dict(motif_counts.most_common()),
        "stuck_agents_per_case_hist": dict(sorted(stuck_per_case.items())),
        "platform": jax.devices()[0].platform,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(
        {"summary": summary, "cases": per_case}, indent=1))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
