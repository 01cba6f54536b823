"""Closed-loop behavioral parity: our batched simulator vs the
reference-style torch loop (benchmarks/torch_baseline.py) with identical
policy weights. On conflict-free cases both loops are fully deterministic,
so trajectories must match step for step."""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))
import torch_baseline as tb  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gnn_pathplanning_tpu.env import SimCase, rollout  # noqa: E402
from gnn_pathplanning_tpu.models import (DCPNet, DCPConfig,  # noqa: E402
                                         params_from_torch_state_dict)


def _torch_model_and_variables(seed=3):
    torch.manual_seed(seed)
    m = tb.TorchDCP(k=3).eval()
    sd = dict(m.state_dict())
    renamed = {}
    for k, v in sd.items():
        k2 = (k.replace("conv.", "ConvLayers.")
               .replace("compress.", "compressMLP.")
               .replace("actions.", "actionsMLP.0."))
        renamed[k2] = v
    renamed["GFL.0.weight"] = sd["gfl_w"]
    renamed["GFL.0.bias"] = sd["gfl_b"]
    variables = params_from_torch_state_dict(renamed)
    return m, variables


def _reference_loop(model, grid, starts, goals, steps):
    pos = starts.copy()
    radius = 6.0
    traj = [pos.copy()]
    with torch.no_grad():
        for t in range(steps):
            obs = tb.render_obs(grid, pos, goals)
            gso, radius = tb.compute_gso(pos, radius, grow=(t == 0))
            logits = model(torch.from_numpy(obs[None]),
                           torch.from_numpy(gso[None]))[0].numpy()
            pos = tb.move(grid, pos, goals, logits)
            traj.append(pos.copy())
    return np.stack(traj)


@pytest.mark.parametrize("n_agents,seed", [(1, 0), (2, 1), (4, 2)])
def test_trajectories_match_reference_loop(n_agents, seed):
    rng = np.random.RandomState(seed)
    grid = (rng.rand(14, 14) < 0.08).astype(np.float32)
    free = np.argwhere(grid == 0)
    idx = rng.choice(len(free), 2 * n_agents, replace=False)
    starts = free[idx[:n_agents]].astype(np.int32)
    goals = free[idx[n_agents:]].astype(np.int32)
    steps = 12

    model, variables = _torch_model_and_variables()
    want = _reference_loop(model, grid, starts.copy(), goals, steps)

    net = DCPNet(DCPConfig(num_taps=3))
    policy = lambda obs, gso: net.apply(variables, obs, gso, train=False)
    case = SimCase(grid=jnp.array(grid), starts=jnp.array(starts),
                   goals=jnp.array(goals),
                   target_makespan=jnp.asarray(steps // 2, jnp.int32),
                   target_flowtime=jnp.asarray(steps, jnp.int32))
    out = rollout(policy, case, max_steps=steps, comm_radius=6.0,
                  key=jax.random.PRNGKey(0), record_paths=True)
    got = np.asarray(out.paths)

    # Compare up to the step where our rollout stopped (done/maxstep latch):
    # while active, both loops must agree exactly on conflict-free dynamics.
    t_stop = int(out.metrics.steps)
    mismatch = None
    for t in range(min(t_stop + 1, steps + 1)):
        if not (got[t] == want[t]).all():
            mismatch = t
            break
    assert mismatch is None, (
        f"trajectory diverged at t={mismatch}:\nours={got[mismatch]}\n"
        f"ref={want[mismatch]}")
