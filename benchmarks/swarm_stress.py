"""Swarm-scale closed-loop rollout stress benchmark (BASELINE.md:36).

Runs the full agent-sharded closed-loop rollout (FOV render, K-hop graph
filter, collision shield) at 1024+ agents on whatever mesh is available —
the single real chip by default (a 1-device mesh exercises the same
shard_map program) — and reports wall-clock agent-steps/s for each filter
path:

- ``dense``: GSO column blocks (per-chip O(N * N/d) memory),
- ``geometric``: fused Pallas position->SpMM, exhaustive grid,
- ``compact``: same through the compacted scalar-prefetch grid,
- ``halo``: strip-partitioned neighbor-only exchange + Pallas strip
  kernels (the pod-scale weak-scaling form).

Usage (real chip):
  python benchmarks/swarm_stress.py --agents 2048 --steps 16
Writes benchmarks/swarm_stress.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--agents", type=int, default=2048)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--world", type=int, default=0,
                   help="grid side (0 = auto: ~2% occupancy)")
    p.add_argument("--radius", type=float, default=6.0)
    p.add_argument("--cap", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--paths", type=str, nargs="+",
                   default=["dense", "geometric", "compact", "halo"])
    p.add_argument("--platform", choices=["cpu", "tpu"], default="tpu",
                   help="cpu = smoke-test the program (dense path only; "
                        "pallas does not lower to CPU)")
    p.add_argument("--out", type=str,
                   default=str(REPO / "benchmarks" / "swarm_stress.json"))
    return p.parse_args()


def main() -> int:
    args = parse_args()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.parallel.swarm_rollout import (
        swarm_rollout, swarm_rollout_halo)

    n, steps = args.agents, args.steps
    w = args.world or int(np.ceil(np.sqrt(n * 50)))
    rng = np.random.RandomState(1234)
    grid = np.zeros((w, w), np.float32)
    free = np.argwhere(grid == 0)
    idx = rng.choice(len(free), 2 * n, replace=False)
    starts = free[idx[:n]].astype(np.int32)
    goals = free[idx[n:]].astype(np.int32)

    model = DCPNet(DCPConfig(num_taps=3))
    variables = model.init_variables(jax.random.PRNGKey(0), num_agents=4)
    mesh = Mesh(np.array(jax.devices()[:1]), ("agents",))
    key = jax.random.PRNGKey(7)

    starts_j = jnp.asarray(starts)
    goals_j = jnp.asarray(goals)

    def run(path):
        # jit the WHOLE rollout: called eagerly, shard_map/scan retrace per
        # call and every surrounding eager op pays this rig's ~25 ms
        # per-dispatch tunnel floor — at N=2048 that polluted the measured
        # time ~50x (22.6 s/rollout eager vs device time under jit).
        if path == "halo":
            def rollout(s, g, k):
                return swarm_rollout_halo(mesh, variables, grid, s, g,
                                          args.radius, steps, k,
                                          geometric=True, cap=args.cap)
        else:
            kw = {"geometric": path != "dense"}
            if path == "compact":
                kw["cap"] = args.cap
            def rollout(s, g, k):
                return swarm_rollout(mesh, variables, grid, s, g,
                                     args.radius, steps, k, **kw)
        f = jax.jit(rollout)
        out = f(starts_j, goals_j, key)
        jax.block_until_ready(out)           # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(starts_j, goals_j, key)
            # Block on the WHOLE output tree and report the median:
            # blocking on .paths alone returned in 41 us on one N=32768
            # capture (an async-dispatch artifact of the tunneled
            # runtime), and min() then publishes exactly that artifact.
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2]
        # Shield fixed-point stats: the early-exit while_loop converges in
        # a handful of rounds in practice (vs the reference's fixed N+1
        # O(N^2) rounds — the old asymptotic ceiling of the swarm story).
        rounds = np.asarray(out.shield_rounds)
        return {"path": path, "seconds": dt,
                "agent_steps_per_s": n * steps / dt,
                # self-describing timing protocol (records from before r4b
                # used min-of-reps and blocked on .paths only; cross-round
                # comparisons need the record to say which statistic it is)
                "protocol": "median-of-reps, block on full output tree",
                "reps": args.reps,
                "shield_rounds_max": int(rounds.max()),
                "shield_rounds_mean": float(rounds.mean())}

    rows = []
    for path in args.paths:
        try:
            rows.append(run(path))
        except Exception as e:                       # honest per-path report
            rows.append({"path": path, "error": repr(e)[:300]})
        print(rows[-1], flush=True)

    result = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0]),
              "agents": n, "steps": steps, "world": w,
              "radius": args.radius, "cap": args.cap,
              "devices_in_mesh": 1, "rows": rows}
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
