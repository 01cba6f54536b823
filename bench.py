"""Rollout throughput benchmark (driver entry point).

Measures closed-loop rollout throughput of the flagship DCP-K3 policy in the
batched jit-compiled simulator — FOV rendering, GSO construction, model
forward, and shielded moves all on device — and compares against the
reference-style torch-CPU loop (benchmarks/torch_baseline.py, cached in
benchmarks/baseline_torch.json).

Prints exactly one JSON line:
  {"metric": "rollout_agent_steps_per_s", "value": ..., "unit": ..., "vs_baseline": ...}
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Benchmark scale: B cases x N agents x T steps per timed run.
BATCH = 256
AGENTS = 10
STEPS = 64
MAP_W = 20


def get_baseline() -> float:
    """Torch-CPU reference-style loop on this host (benchmarks/
    torch_baseline.py). NOTE: the reference itself ran on a GPU; this rig
    has none, so vs_baseline is 'vs torch-CPU on this 2-core host'.

    Integrity (VERDICT r3 weak #1): the cached number is only trusted when it
    carries provenance showing it was measured on an idle host. A stale cache
    is re-measured only when the host is idle NOW (the script itself refuses
    at loadavg > 1.0); otherwise the committed idle-host number is kept and
    the staleness is reported on stderr rather than silently re-measured
    under load — that failure mode understated torch 2.3x in round 3.

    Staleness is CONTENT-based (sha256 of torch_baseline.py recorded in the
    cache), not mtime-based: a fresh git checkout resets both mtimes in
    arbitrary order, and in round 5 that re-triggered a re-measure minutes
    after a training sweep (loadavg 0.985 slipped under the old 1.0 gate,
    best-of-3 measured 1059 vs the true idle 1908.8 — understating torch
    1.8x). The idle gate is now 0.5 on both loadavg windows."""
    import hashlib
    import os
    cache = REPO / "benchmarks" / "baseline_torch.json"
    script = REPO / "benchmarks" / "torch_baseline.py"
    script_sha = hashlib.sha256(script.read_bytes()).hexdigest()
    stale = True
    if cache.exists():
        try:
            stale = (json.loads(cache.read_text())
                     .get("script_sha256") != script_sha)
        except Exception:
            pass
    if stale:
        if max(os.getloadavg()[:2]) > 0.5 and cache.exists():
            print("bench.py: baseline cache stale but host is not idle; "
                  "keeping committed idle-host baseline", file=sys.stderr)
        else:
            subprocess.run([sys.executable, str(script)],
                           check=True, capture_output=True, timeout=1200)
    data = json.loads(cache.read_text())
    if "loadavg_1m_before" not in data:
        print("bench.py: WARNING baseline lacks load provenance; "
              "re-measure on an idle host", file=sys.stderr)
    elif data.get("forced_under_load"):
        print("bench.py: WARNING baseline was force-measured under load",
              file=sys.stderr)
    return float(data["agent_steps_per_s"])


def make_cases(rng: np.random.RandomState):
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.env.simulator import SimCase

    grids = (rng.rand(BATCH, MAP_W, MAP_W) < 0.1).astype(np.float32)
    starts = np.zeros((BATCH, AGENTS, 2), np.int32)
    goals = np.zeros((BATCH, AGENTS, 2), np.int32)
    for b in range(BATCH):
        free = np.argwhere(grids[b] == 0)
        idx = rng.choice(len(free), 2 * AGENTS, replace=False)
        starts[b] = free[idx[:AGENTS]]
        goals[b] = free[idx[AGENTS:]]
    # target makespan chosen so maxstep == STEPS (rate_maxstep = 2)
    mk = np.full((BATCH,), STEPS // 2, np.int32)
    ft = mk * AGENTS
    return SimCase(grid=jnp.asarray(grids), starts=jnp.asarray(starts),
                   goals=jnp.asarray(goals), target_makespan=jnp.asarray(mk),
                   target_flowtime=jnp.asarray(ft))


def main() -> None:
    import jax
    # Persistent compilation cache: first-compile of the rollout program over
    # the tunneled TPU costs minutes; subsequent bench runs reuse it.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.env.simulator import rollout_batch
    from gnn_pathplanning_tpu.models import DCPConfig, DCPNet

    rng = np.random.RandomState(1337)
    model = DCPNet(DCPConfig(num_taps=3))
    variables = model.init_variables(jax.random.PRNGKey(0), num_agents=AGENTS)

    def policy(obs, gso):
        return model.apply(variables, obs, gso, train=False)

    cases = make_cases(rng)

    @jax.jit
    def run(key):
        out = rollout_batch(policy, cases, STEPS, 6.0, key, rate_maxstep=2)
        # Force full-horizon stepping cost into the measurement regardless of
        # early termination bookkeeping: return a reduction over metrics.
        return out.metrics.steps.sum(), out.metrics.num_agents_reached.sum()

    key = jax.random.PRNGKey(0)
    steps_done, _ = jax.block_until_ready(run(key))  # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        steps_done, reached = jax.block_until_ready(
            run(jax.random.PRNGKey(i + 1)))
    dt = (time.perf_counter() - t0) / reps

    # The scan always executes STEPS iterations of full batched work
    # (masked when done), so the honest compute rate uses the static horizon.
    agent_steps = BATCH * AGENTS * STEPS
    rate = agent_steps / dt

    baseline = get_baseline()
    result = {
        "metric": "rollout_agent_steps_per_s",
        "value": round(rate, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(rate / baseline, 2),
    }
    # Secondary gate: the swarm-scale geometric path (compact Pallas grid,
    # N=2048 agent-sharded rollout) — a kernel-perf regression there was
    # invisible to the dense N=10 primary metric (VERDICT r2 weak #5).
    try:
        result["secondary"] = swarm_secondary()
    except Exception as e:                   # never fail the primary metric
        result["secondary"] = {"error": repr(e)[:200]}
    print(json.dumps(result))


def swarm_secondary(n: int = 2048, steps: int = 8) -> dict:
    import jax
    from jax.sharding import Mesh
    from gnn_pathplanning_tpu.models import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.parallel.swarm_rollout import swarm_rollout

    rng = np.random.RandomState(99)
    w = int(np.ceil(np.sqrt(n * 50)))
    grid = np.zeros((w, w), np.float32)
    idx = rng.choice(w * w, 2 * n, replace=False)
    starts = np.stack([idx[:n] // w, idx[:n] % w], -1).astype(np.int32)
    goals = np.stack([idx[n:] // w, idx[n:] % w], -1).astype(np.int32)
    model = DCPNet(DCPConfig(num_taps=3))
    variables = model.init_variables(jax.random.PRNGKey(0), num_agents=4)
    mesh = Mesh(np.array(jax.devices()[:1]), ("agents",))
    on_tpu = jax.devices()[0].platform != "cpu"

    import jax.numpy as jnp
    starts_j, goals_j = jnp.asarray(starts), jnp.asarray(goals)

    # jit the WHOLE rollout: eager shard_map/scan retraces per call and
    # every surrounding eager op pays the tunnel's ~25 ms dispatch floor,
    # which polluted the eager measurement ~50x at this scale.
    @jax.jit
    def run(s, g, k):
        return swarm_rollout(mesh, variables, grid, s, g, 6.0,
                             steps, k,
                             geometric=on_tpu, cap=16 if on_tpu else None,
                             interpret=False)

    key7 = jax.random.PRNGKey(7)
    out = run(starts_j, goals_j, key7)
    jax.block_until_ready(out.paths)         # compile + warm
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        out = run(starts_j, goals_j, key7)
        jax.block_until_ready(out.paths)
        best = min(best, time.perf_counter() - t0)
    rounds = np.asarray(out.shield_rounds)
    return {"metric": "swarm2048_agent_steps_per_s",
            "value": round(n * steps / best, 1),
            "path": "geometric-compact" if on_tpu else "dense",
            "shield_rounds_max": int(rounds.max())}


if __name__ == "__main__":
    main()
