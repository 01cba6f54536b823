"""Sweep the opt-in deadlock_break threshold on a held-out pool (CPU-OK).

Measures what the decentralized stall-escape rule (env/simulator.py
rollout_batch deadlock_break=K) does to rate_ReachGoal / deltaFT for a
trained checkpoint. The test split is never touched.

Usage:
  python scripts/sweep_deadlock_break.py <checkpoint.msgpack> \
      [--pool data2/map20x20_density_p1/10_Agent/valid2] [--limit 600] \
      [--thresholds 0 3 5 8] [--cpu]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--pool",
                    default="data2/map20x20_density_p1/10_Agent/valid2")
    ap.add_argument("--limit", type=int, default=600)
    ap.add_argument("--thresholds", type=int, nargs="*", default=[0, 3, 5, 8])
    ap.add_argument("--taps", type=int, default=3)
    ap.add_argument("--commR", type=float, default=6.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize pins axon)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gnn_pathplanning_tpu.data.dataset import load_split
    from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.train.checkpoint import load_checkpoint
    from gnn_pathplanning_tpu.train.trainer import TrainConfig, Trainer

    pool = load_split(args.pool, limit=args.limit)
    model = DCPNet(DCPConfig(num_taps=args.taps))
    rows = []
    for k in args.thresholds:
        trainer = Trainer(model, TrainConfig(deadlock_break=k,
                           comm_radius=args.commR),
                          Path(args.checkpoint).parents[1], valid_set=pool)
        trainer.state, _ = load_checkpoint(args.checkpoint, trainer.state)
        m = trainer.validate_rollout(pool, limit=args.limit,
                                     label=f"dlb{k}")
        rows.append(dict(deadlock_break=k,
                         rate_ReachGoal=m["rate_ReachGoal"],
                         rate_notReachGoalSH=m["rate_notReachGoalSH"],
                         mean_deltaMP=m["mean_deltaMP"],
                         mean_deltaFT=m["mean_deltaFT"],
                         rate_CollisionMove=m["rate_CollisionMove"]))
        print(json.dumps(rows[-1]), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
