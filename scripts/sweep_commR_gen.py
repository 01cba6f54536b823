"""Generalization commR sweep on held-out pools (never the test splits).

The reference's own generalization protocol tunes the communication radius
per regime (its 40x40/64-agent test runs with --commR 11 while training
used 6 — /root/reference/scripts/test_general_dcpOE_best_K3.sh), so
choosing commR per (map, N) on a fresh validation pool is reference-
faithful.  This sweep scores a checkpoint on the seed-515151 valid2
generalization pools (data2/map{28,40}... — maps disjoint from the 1337
test pools) across commR values and prints/saves the per-regime winner.

Usage:
  python scripts/sweep_commR_gen.py <checkpoint.msgpack> \
      [--commR 5 6 7 8 9 11] [--cpu] [--out benchmarks/commR_sweep.json]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

REGIMES = [
    # (pool path, num_agents, limit)
    ("data2/map28x28_density_p1/20_Agent/valid2", 20, 100),
    ("data2/map40x40_density_p1/40_Agent/valid2", 40, 50),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--commR", type=float, nargs="+",
                    default=[5.0, 6.0, 7.0, 8.0, 9.0, 11.0])
    ap.add_argument("--taps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (post-import switch; the "
                         "env var does not work on this rig)")
    ap.add_argument("--out", default="benchmarks/commR_sweep.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gnn_pathplanning_tpu.data.dataset import load_split
    from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.train.checkpoint import load_checkpoint
    from gnn_pathplanning_tpu.train.trainer import TrainConfig, Trainer

    model = DCPNet(DCPConfig(num_taps=args.taps))
    results = []
    for pool_path, n_agents, limit in REGIMES:
        pool = load_split(pool_path, limit=limit)
        rows = []
        for r in args.commR:
            tcfg = TrainConfig(comm_radius=float(r))
            trainer = Trainer(model, tcfg, Path("/tmp/commr_sweep_exp"),
                              valid_set=pool)
            trainer.state, _ = load_checkpoint(args.checkpoint,
                                               trainer.state)
            m = trainer.validate_rollout(pool, limit=limit,
                                         label=f"commR{r}")
            rows.append(dict(commR=r,
                             rate_ReachGoal=m["rate_ReachGoal"],
                             rate_agentsReachGoal=m.get(
                                 "rate_agentsReachGoal"),
                             mean_deltaFT=m["mean_deltaFT"]))
            print(f"{pool_path} commR={r}: "
                  f"rate={m['rate_ReachGoal']:.4f} "
                  f"per-agent={m.get('rate_agentsReachGoal', 0):.4f}",
                  flush=True)
        rows.sort(key=lambda x: (-x["rate_ReachGoal"], x["mean_deltaFT"]))
        results.append(dict(pool=pool_path, num_agents=n_agents,
                            cases=pool.num_cases, ranking=rows,
                            winner=rows[0]["commR"]))

    out = Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(
        dict(checkpoint=args.checkpoint, results=results), indent=1))
    print(json.dumps({r["pool"]: r["winner"] for r in results}))


if __name__ == "__main__":
    main()
