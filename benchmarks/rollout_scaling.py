"""Primary-rollout batch-scaling probe (VERDICT r3 weak #6).

The driver-gated primary metric (bench.py: B=256 cases x N=10 x 64 steps)
has sat at 197-201k agent-steps/s for three rounds. That is fine IF the
small-shape program is latency-bound rather than chip-bound — but nothing
in the repo demonstrated it. This probe measures the same jitted rollout at
growing batch sizes: near-linear rate growth with B means the B=256 point
is dominated by per-step kernel-launch/fusion latency of tiny [B,10,...]
ops (the chip is mostly idle), not by any resource the kernels could use
better; the saturated operating point is the honest "chip throughput".

Run on the real chip: python benchmarks/rollout_scaling.py
Writes benchmarks/rollout_scaling.json.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

STEPS = 64
AGENTS = 10
MAP_W = 20


def measure(batch: int, reps: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    import bench

    bench_batch = bench.BATCH
    try:
        bench.BATCH = batch
        rng = np.random.RandomState(1337)
        cases = bench.make_cases(rng)
    finally:
        bench.BATCH = bench_batch

    from gnn_pathplanning_tpu.env.simulator import rollout_batch
    from gnn_pathplanning_tpu.models import DCPConfig, DCPNet

    model = DCPNet(DCPConfig(num_taps=3))
    variables = model.init_variables(jax.random.PRNGKey(0),
                                     num_agents=AGENTS)

    def policy(obs, gso):
        return model.apply(variables, obs, gso, train=False)

    @jax.jit
    def run(key):
        out = rollout_batch(policy, cases, STEPS, 6.0, key, rate_maxstep=2)
        return out.metrics.steps.sum(), out.metrics.num_agents_reached.sum()

    jax.block_until_ready(run(jax.random.PRNGKey(0)))
    best = np.inf
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(i + 1)))
        best = min(best, time.perf_counter() - t0)
    return batch * AGENTS * STEPS / best


def main() -> int:
    import jax
    rows = []
    for b in (64, 256, 1024, 4096):
        rate = measure(b)
        prev = rows[-1] if rows else None
        rows.append({"batch": b, "agent_steps_per_s": rate,
                     "scaling_vs_prev":
                         None if prev is None
                         else rate / prev["agent_steps_per_s"]})
        print(rows[-1], flush=True)
    r0, r1 = rows[0]["agent_steps_per_s"], rows[-1]["agent_steps_per_s"]
    result = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "steps": STEPS, "agents": AGENTS, "map_w": MAP_W,
        "rate_ratio_largest_vs_smallest": r1 / r0,
        "interpretation": (
            "flat rate across batch sizes => the B=256 driver metric is a "
            "REAL program ceiling for this dense N=10 shape (each step's "
            "cost scales with batch), NOT amortizable launch latency; "
            "growth with batch would instead have indicated latency-bound. "
            "Measured r4: flat 179-205k across B=64..4096 (ratio 1.01)"),
        "rows": rows}
    out = REPO / "benchmarks" / "rollout_scaling.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
