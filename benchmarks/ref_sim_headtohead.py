"""Head-to-head: OUR trained weights inside the REFERENCE simulator vs ours.

Settles whether low generalization scores (e.g. 40x40/40ag) are model
quality or a simulator/eval discrepancy: the same checkpoint is exported
to the reference's DecentralPlannerNet (torch) and rolled out by the
reference's own multiRobotSim (/root/reference/utils/
multirobotsim_dcenlocal.py, unpatched random winner), then by our
env.simulator.rollout_batch, on the SAME solved test cases with the same
commR / rate_maxstep. Reports per-case all-reach + #agents-arrived for
both simulators.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/ref_sim_headtohead.py \
      <ckpt.msgpack> [--set 40x40_40] [--cases 12] [--seed 0]
"""
from __future__ import annotations

import argparse
import json
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from reference_loader import AttrDict, load_reference  # noqa: E402

from gnn_pathplanning_tpu.data.dataset import load_split  # noqa: E402
from gnn_pathplanning_tpu.env.simulator import SimCase, rollout_batch  # noqa: E402
from gnn_pathplanning_tpu.models import DCPConfig, DCPNet  # noqa: E402
from gnn_pathplanning_tpu.models.torch_export import (  # noqa: E402
    torch_state_dict_from_params)
from gnn_pathplanning_tpu.train.checkpoint import load_checkpoint  # noqa: E402

SETS = {
    "20x20_10": ("data2/map20x20_density_p1/10_Agent/test", 10),
    "28x28_20": ("data2/map28x28_density_p1/20_Agent/test", 20),
    "40x40_40": ("data2/map40x40_density_p1/40_Agent/test", 40),
}


def run_reference(sim, model, rec, n, rate_maxstep, comm_r):
    cfg = AttrDict(num_agents=n, device=torch.device("cpu"),
                   rate_maxstep=rate_maxstep, commR=comm_r)
    robot = sim.multiRobotSim(cfg)
    starts = rec.states[0]
    load_input = torch.zeros(1, 2, n, 2)
    load_input[0, 0] = torch.from_numpy(np.asarray(rec.goals, np.float32))
    load_input[0, 1] = torch.from_numpy(np.asarray(starts, np.float32))
    onehot = np.eye(5, dtype=np.float32)[rec.actions]          # [T, N, 5]
    load_target = torch.from_numpy(onehot.transpose(1, 0, 2)[None])
    tensor_map = torch.from_numpy(np.asarray(rec.grid, np.float32))[None]
    robot.setup(load_input, load_target, torch.tensor(rec.makespan),
                tensor_map, 0)
    maxstep = robot.getMaxstep()
    all_reach = False
    with torch.no_grad():
        for step in range(maxstep):
            state = robot.getCurrentState()
            gso = robot.getGSO(step)
            model.addGSO(gso.float())
            action_vec = model(state.float())
            all_reach, _, _ = robot.move(action_vec, step + 1)
            if all_reach:
                break
    return dict(all_reach=bool(all_reach),
                reached=int(sum(robot.count_reachgoal)), maxstep=maxstep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--set", default="40x40_40", choices=sorted(SETS))
    ap.add_argument("--cases", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rate_maxstep", type=int, default=2)
    ap.add_argument("--commR", type=float, default=6.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize pins axon; "
                         "the JAX_PLATFORMS env var does not work here)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    split_dir, n = SETS[args.set]
    ds = load_split(split_dir, limit=args.cases)
    records = ds.records[: args.cases]

    state, _meta = load_checkpoint(args.ckpt, None)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    net = DCPNet(DCPConfig(num_taps=3))

    dp = load_reference("graphs.models.decentralplanner")
    sim = load_reference("utils.multirobotsim_dcenlocal")
    cfg = AttrDict(num_agents=n, nGraphFilterTaps=3,
                   device=torch.device("cpu"))
    ref_model = dp.DecentralPlannerNet(cfg)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in torch_state_dict_from_params(variables).items()}
    missing = ref_model.load_state_dict(sd, strict=False)
    assert not missing.missing_keys, missing.missing_keys
    ref_model.eval()
    random.seed(args.seed)

    def policy(obs, gso):
        return net.apply(variables, obs, gso, train=False)

    rows = []
    for i, rec in enumerate(records):
        ref = run_reference(sim, ref_model, rec, n,
                            args.rate_maxstep, args.commR)
        case = SimCase(
            grid=jnp.asarray(rec.grid, jnp.float32)[None],
            starts=jnp.asarray(rec.states[0], jnp.int32)[None],
            goals=jnp.asarray(rec.goals, jnp.int32)[None],
            target_makespan=jnp.asarray([rec.target_makespan], jnp.int32),
            target_flowtime=jnp.asarray([rec.target_flowtime], jnp.int32),
            solution_makespan=jnp.asarray([rec.makespan], jnp.int32))
        out = rollout_batch(policy, case, ref["maxstep"], args.commR,
                            jax.random.PRNGKey(args.seed + i),
                            args.rate_maxstep, winner="random")
        ours = dict(all_reach=bool(out.metrics.all_reached[0]),
                    reached=int(np.asarray(out.reached[0]).sum()))
        rows.append(dict(case=i, ref=ref, ours=ours))
        print(f"case {i:3d} maxstep {ref['maxstep']:4d} | "
              f"ref: reach={ref['all_reach']} n={ref['reached']:3d} | "
              f"ours: reach={ours['all_reach']} n={ours['reached']:3d}",
              flush=True)

    summary = dict(
        set=args.set, cases=len(rows), ckpt=args.ckpt,
        ref_rate=sum(r["ref"]["all_reach"] for r in rows) / len(rows),
        ours_rate=sum(r["ours"]["all_reach"] for r in rows) / len(rows),
        ref_agents=sum(r["ref"]["reached"] for r in rows) / (len(rows) * n),
        ours_agents=sum(r["ours"]["reached"] for r in rows) / (len(rows) * n))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
