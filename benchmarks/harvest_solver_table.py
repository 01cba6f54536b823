"""Measured solve-rate/latency table for generalization-regime harvests
(r4 verdict "Next round" #3 deliverable).

Harvested failure cases — the current policy's residual MAPF problems at
28x28/20, 40x40/40 and 40x40/64 — are exactly the load the online expert
must clear every OE epoch, and are much harder than fresh pool cases (the
stuck configurations are congested by construction). This benchmark
reconstructs those problems from a training leg's failure caches
(states[0] = harvested starts, reference dump semantics,
/root/reference/utils/multirobotsim_dcenlocal_onlineExpert.py:705-730) and
times each solver configuration on them:

- ecbs:        plain ECBS w=1.1, no expansion cap, single budget
- ecbs_adapt:  adaptive-w ECBS (50/25/25 at w/1.2/1.3) + SIPP fallback
- prioritized: pure prioritized SIPP

Output: one JSON with per-regime, per-solver {solve_rate, status counts,
latency percentiles, mean cost overhead vs the cached ECBS solution}.

Usage:
  python benchmarks/harvest_solver_table.py <exp_dir> [--out F] [--limit N]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def load_harvest_problems(cache_root: Path, limit: int):
    """(grid, starts, goals, cached_cost) per record under cache_root."""
    from gnn_pathplanning_tpu.data.transform import load_record
    probs = []
    files = sorted(cache_root.glob("epoch_*/*.npz"))[:limit]
    for f in files:
        rec = load_record(f)
        states = rec.states.astype(np.int32)
        cost = int((np.abs(np.diff(states, axis=0)).sum(-1) > 0).sum())
        probs.append((rec.grid.astype(np.float32), states[0],
                      rec.goals.astype(np.int32), cost))
    return probs


def bench_solver(probs, algo, timeout, adaptive, fallback):
    from gnn_pathplanning_tpu.data.solvers import solve_case
    lat, statuses, overheads = [], {}, []
    for grid, starts, goals, cached_cost in probs:
        t0 = time.perf_counter()
        res = solve_case(grid, starts, goals, algo=algo, w=1.1,
                         timeout=timeout, adaptive_w=adaptive,
                         max_expansions=0, fallback=fallback)
        dt = time.perf_counter() - t0
        lat.append(dt)
        statuses[res.status] = statuses.get(res.status, 0) + 1
        if res.ok and cached_cost > 0:
            overheads.append(res.cost / cached_cost)
    lat = np.array(lat)
    ok = statuses.get("ok", 0)
    return {
        "n": len(probs), "solved": ok,
        "solve_rate": ok / max(len(probs), 1),
        "statuses": statuses,
        "latency_s": {"p50": float(np.median(lat)),
                      "p90": float(np.percentile(lat, 90)),
                      "max": float(lat.max()),
                      "mean": float(lat.mean()),
                      "total": float(lat.sum())},
        # cost of this solver's solutions relative to the leg's cached
        # (adaptive-ECBS) solutions on the same instances, solved-only
        "cost_vs_cached": (float(np.mean(overheads)) if overheads else None),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir", help="training leg with failure_cache_gen*/")
    ap.add_argument("--out", default="benchmarks/harvest_solver_table_r5.json")
    ap.add_argument("--limit", type=int, default=64,
                    help="harvest problems per regime")
    ap.add_argument("--timeout", type=float, default=60.0)
    args = ap.parse_args()

    exp = Path(args.exp_dir)
    regimes = {}
    for cache in sorted(exp.glob("failure_cache*")):
        probs = load_harvest_problems(cache, args.limit)
        if not probs:
            continue
        n_agents = probs[0][1].shape[0]
        w = probs[0][0].shape[0]
        name = f"{w}x{w}_{n_agents}ag[{cache.name}]"
        print(f"== {name}: {len(probs)} harvest problems", flush=True)
        rows = {}
        for label, (algo, adaptive, fb) in {
                "ecbs": ("ecbs", False, None),
                "ecbs_adapt": ("ecbs", True, "prioritized"),
                "prioritized": ("prioritized", False, None)}.items():
            rows[label] = bench_solver(probs, algo, args.timeout,
                                       adaptive, fb)
            print(f"  {label:12s} rate={rows[label]['solve_rate']:.3f} "
                  f"p50={rows[label]['latency_s']['p50']:.2f}s "
                  f"p90={rows[label]['latency_s']['p90']:.2f}s "
                  f"total={rows[label]['latency_s']['total']:.1f}s "
                  f"statuses={rows[label]['statuses']}", flush=True)
        regimes[name] = rows

    out = {"exp_dir": str(exp), "limit": args.limit,
           "timeout": args.timeout, "regimes": regimes}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
