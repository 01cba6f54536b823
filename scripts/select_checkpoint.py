"""Unbiased best-checkpoint selection on a held-out selection pool.

The training run picks `model_best` by rate_ReachGoal on the 200-case valid
split — noisy to ±2pp (see ROUND2.md). This script re-scores every numbered
checkpoint (plus optional stochastic-weight-averaging candidates built from
checkpoint tails) on a LARGER, fresh selection pool (valid2: maps disjoint
from train/valid/test by construction — different generator seed), then
writes the winner to ``<exp>/checkpoints/model_selected.msgpack`` and a
ranking JSON next to it.

The test split is never touched here: selection stays unbiased.

Usage:
  python scripts/select_checkpoint.py <exp_dir> [--pool data2/.../valid2]
      [--limit 600] [--swa 4 8 16] [--last 12]
"""
from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import jax
import numpy as np

from gnn_pathplanning_tpu.data.dataset import load_split
from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
from flax import serialization

from gnn_pathplanning_tpu.train.checkpoint import load_checkpoint
from gnn_pathplanning_tpu.train.trainer import TrainConfig, Trainer


def numbered_checkpoints(ckpt_dir: Path) -> list[tuple[int, Path]]:
    out = []
    for p in ckpt_dir.glob("checkpoint_epoch*.msgpack"):
        m = re.search(r"epoch(\d+)", p.name)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def average_states(states):
    """Elementwise mean over TrainState pytrees (params + batch_stats; the
    optimizer state is irrelevant for inference and copied from the last)."""
    def mean(*xs):
        return sum(np.asarray(x, np.float64) for x in xs) / len(xs)
    avg = jax.tree_util.tree_map(mean, *states)
    cast = jax.tree_util.tree_map(
        lambda a, ref: np.asarray(a, np.asarray(ref).dtype), avg, states[-1])
    return cast


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--pool", default="data2/map20x20_density_p1/10_Agent/valid2")
    ap.add_argument("--limit", type=int, default=600)
    ap.add_argument("--last", type=int, default=12,
                    help="re-score the last N numbered checkpoints")
    ap.add_argument("--swa", type=int, nargs="*", default=[4, 8],
                    help="also score SWA averages over these tail lengths")
    ap.add_argument("--taps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize pins axon; "
                         "the env var does not work on this rig)")
    ap.add_argument("--gen-pools", type=str, nargs="*", default=[],
                    help="extra selection pools 'path:limit' (e.g. the "
                         "28x28/20 and 40x40/40 valid2 pools). The top "
                         "--gen-top candidates by primary-pool rate are "
                         "re-scored on each; the winner maximizes the "
                         "MEAN rate_ReachGoal across primary+gen pools. "
                         "Use for legs whose objective is generalization "
                         "(the mixed-distribution recipe).")
    ap.add_argument("--gen-top", type=int, default=5)
    ap.add_argument("--ensemble-extra", type=str, default=None,
                    help="external checkpoint path: scored STANDALONE as a "
                         "candidate (so a fine-tune that never beats its "
                         "seed cannot demote model_selected below the "
                         "seed) and additionally as an ensemble of "
                         "{winner, this} (logits averaged). The ensemble "
                         "row is ranking-only; model_selected is the best "
                         "single candidate (use --ensemble_checkpoints at "
                         "eval time if the ensemble wins)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    exp = Path(args.exp_dir)
    ckpt_dir = exp / "checkpoints"
    pool = load_split(args.pool, limit=args.limit)
    model = DCPNet(DCPConfig(num_taps=args.taps))
    tcfg = TrainConfig()
    trainer = Trainer(model, tcfg, exp, valid_set=pool)

    numbered = numbered_checkpoints(ckpt_dir)[-args.last:]
    candidates: list[tuple[str, object]] = []
    loaded = {}
    for ep, path in numbered:
        state, _ = load_checkpoint(path, trainer.state)
        loaded[ep] = state
        candidates.append((f"epoch{ep}", state))
    best_path = ckpt_dir / "model_best.msgpack"
    if best_path.exists():
        state, meta = load_checkpoint(best_path, trainer.state)
        candidates.append((f"model_best(ep{meta.get('epoch', '?')})", state))
    for k in args.swa:
        tail = [loaded[ep] for ep, _ in numbered[-k:] if ep in loaded]
        if len(tail) >= 2:
            candidates.append((f"swa_last{len(tail)}", average_states(tail)))
    if args.ensemble_extra:
        extra_state, _ = load_checkpoint(args.ensemble_extra, trainer.state)
        candidates.append((f"extra({Path(args.ensemble_extra).stem})",
                           extra_state))

    rows = []
    for name, state in candidates:
        trainer.state = state
        m = trainer.validate_rollout(pool, limit=args.limit, label=name)
        rows.append(dict(name=name, rate_ReachGoal=m["rate_ReachGoal"],
                         mean_deltaFT=m["mean_deltaFT"]))
        print(f"{name:24s} rate_ReachGoal={m['rate_ReachGoal']:.4f} "
              f"dFT={m['mean_deltaFT']:.4f}", flush=True)

    # Winner: success rate, then lower flowtime deterioration as tiebreak.
    rows.sort(key=lambda r: (-r["rate_ReachGoal"], r["mean_deltaFT"]))

    if args.gen_pools:
        # Generalization-aware selection: re-score the primary top-K on
        # each gen pool; winner maximizes the mean rate across all pools.
        gen_sets = []
        for spec in args.gen_pools:
            path, _, lim = spec.rpartition(":")
            gen_sets.append((path, load_split(path, limit=int(lim))))
        cand_map = dict(candidates)
        finalists = rows[:args.gen_top]
        for row in finalists:
            trainer.state = cand_map[row["name"]]
            rates = [row["rate_ReachGoal"]]
            for path, gpool in gen_sets:
                gm = trainer.validate_rollout(
                    gpool, limit=gpool.num_cases,
                    label=f"{row['name']}@{'/'.join(Path(path).parts[-3:-1])}")
                # include the agent-count dir: two pools of the same
                # map family (40x40 40ag vs 64ag) must not share a key
                key = f"rate@{'/'.join(Path(path).parts[-3:-1])}"
                row[key] = gm["rate_ReachGoal"]
                rates.append(gm["rate_ReachGoal"])
            row["mean_rate_all_pools"] = float(np.mean(rates))
            print(f"{row['name']:24s} mean_all_pools="
                  f"{row['mean_rate_all_pools']:.4f} "
                  + " ".join(f"{k}={v:.3f}" for k, v in row.items()
                             if k.startswith("rate@")), flush=True)
        finalists.sort(key=lambda r: (-r["mean_rate_all_pools"],
                                      r["mean_deltaFT"]))
        rows = finalists + rows[args.gen_top:]
    winner = rows[0]["name"]
    state = dict(candidates)[winner]

    if args.ensemble_extra and winner == f"extra({Path(args.ensemble_extra).stem})":
        # The extra candidate itself won the standalone ranking: an
        # "ensemble" of {winner, extra} would average the model with
        # itself — meaningless row, skip it (ADVICE r3).
        print("ensemble scoring skipped: winner IS the extra candidate",
              flush=True)
    elif args.ensemble_extra:
        trainer.state = state
        trainer.ensemble_states = [extra_state]
        m = trainer.validate_rollout(pool, limit=args.limit,
                                     label="ensemble")
        trainer.ensemble_states = []
        row = dict(name=f"ensemble({winner}+{Path(args.ensemble_extra).stem})",
                   rate_ReachGoal=m["rate_ReachGoal"],
                   mean_deltaFT=m["mean_deltaFT"])
        rows.append(row)
        if not args.gen_pools:
            # gen-pool ranking must survive: re-sorting by primary rate
            # here scrambled the recorded ranking below the winner
            rows.sort(key=lambda r: (-r["rate_ReachGoal"],
                                     r["mean_deltaFT"]))
        print(f"{row['name']:48s} rate_ReachGoal="
              f"{m['rate_ReachGoal']:.4f} dFT={m['mean_deltaFT']:.4f}",
              flush=True)
    winner_row = next(r for r in rows if r["name"] == winner)
    out = ckpt_dir / "model_selected.msgpack"
    out.write_bytes(serialization.to_bytes(state))
    out.with_suffix(".meta.json").write_text(json.dumps(
        {"selected_from": winner, "pool": args.pool,
         "pool_cases": pool.num_cases,
         "rate_ReachGoal": winner_row["rate_ReachGoal"]}))
    (ckpt_dir / "selection.json").write_text(json.dumps(
        dict(pool=args.pool, cases=pool.num_cases, winner=winner,
             ranking=rows), indent=1))
    print(json.dumps(dict(winner=winner, **winner_row)))


if __name__ == "__main__":
    main()
