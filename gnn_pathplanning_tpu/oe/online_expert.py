"""Online Expert (DAgger-style) failure harvesting and data aggregation.

Capability parity with the reference's OE pipeline
(/root/reference/agents/decentralplannerlocal_OnlineExpert.py:289-309,
utils/multirobotsim_dcenlocal_onlineExpert.py:705-730,
onlineExpert/ECBS_onlineExpert.py, onlineExpert/DataTransformer_local_onlineExpert.py):

1. During the periodic rollout over training-set cases, failed cases are
   harvested as *new* MAPF problems whose starts are the agents' current
   (post-rollout) positions and whose goals are unchanged.
2. The native ECBS solves them with a 60 s per-case timeout; failures are
   skipped silently (ECBS_onlineExpert.py:103-104).
3. Solutions become training records under ``cache_dir/epoch_{e}/`` and the
   training set is rebuilt with those directories merged in
   (CreateDataset.update_data_path_trainingset semantics).

The harvest step consumes the batched simulator's Rollout directly — no YAML
round-trip needed in-process (the YAML contract is still exercised by the
solver subprocess boundary).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from ..data.cases import CasePool
from ..data.dataset import load_split
from ..data.solvers import ExpertSolver
from ..data.transform import record_from_solution, save_record
from ..train.trainer import Trainer


@dataclasses.dataclass
class OnlineExpertConfig:
    start_epoch: int = 20          # reference Start_onlineExpert
    timeout: float = 60.0          # onlineExpert/ECBS_onlineExpert.py:29
    workers: int = 4
    num_rollouts: int = 500        # reference num_test_trainingSet
    comm_radius: float = 6.0
    # DAgger oversampling of the failure cache (1 = reference-proportional
    # merge; docs/stall_analysis_r4.md motivates > 1)
    cache_repeat: int = 1


def harvest_failures(rollout, cases) -> CasePool:
    """Failed cases -> new MAPF problems from current positions.

    ``rollout``: batched env.Rollout; ``cases``: the SimCase batch it ran on.
    An agent already at its goal keeps its position (== goal) as its start,
    exactly like the reference dump of current predicted positions
    (multirobotsim_dcenlocal_onlineExpert.py:705-730).
    """
    failed = ~np.asarray(rollout.metrics.all_reached)
    grids = np.asarray(cases.grid)
    goals = np.asarray(cases.goals)
    final_pos = np.asarray(rollout.final_pos)
    pool = CasePool([], [], [], [], [])
    for i in np.nonzero(failed)[0]:
        # Distinct-position invariant is maintained by collision shielding,
        # but a degenerate overlap would make the case unsolvable; skip those.
        if len({tuple(p) for p in final_pos[i]}) != final_pos.shape[1]:
            continue
        pool.grids.append(grids[i])
        pool.starts.append(final_pos[i].astype(np.int32))
        pool.goals.append(goals[i].astype(np.int32))
        pool.map_ids.append(int(i))
        pool.case_ids.append(int(i))
    return pool


class OnlineExpert:
    def __init__(self, cache_dir: str | Path, cfg: OnlineExpertConfig):
        self.cache_dir = Path(cache_dir)
        self.cfg = cfg
        self.solver = ExpertSolver(algo="ecbs", w=1.1, timeout=cfg.timeout,
                                   workers=cfg.workers)

    def solve_and_cache(self, pool: CasePool, epoch: int) -> int:
        """ECBS the harvested failures; write records for epoch `epoch`."""
        if not pool.grids:
            return 0
        out = self.cache_dir / f"epoch_{epoch}"
        out.mkdir(parents=True, exist_ok=True)
        results = self.solver.solve_batch(pool.grids, pool.starts, pool.goals)
        saved = 0
        for res, grid, goals, cid in zip(results, pool.grids, pool.goals,
                                         pool.case_ids):
            if not res.ok or res.paths is None:
                continue
            sched = res.schedule_array()
            if sched.shape[0] < 2:
                continue
            rec = record_from_solution(grid, goals, sched,
                                       self.cfg.comm_radius)
            save_record(out / f"train_IDCase{cid}_MP{rec.makespan}.npz", rec)
            saved += 1
        return saved

    def cache_dirs(self) -> list[Path]:
        return sorted(p for p in self.cache_dir.glob("epoch_*") if p.is_dir())


class OnlineExpertTrainer(Trainer):
    """Trainer + the OE epoch hook (excuation_onlineExport semantics:
    gated on Start_onlineExpert and the validation cadence)."""

    def __init__(self, *args, oe_cfg: OnlineExpertConfig | None = None,
                 train_dir: str | Path | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.oe_cfg = oe_cfg or OnlineExpertConfig()
        self.train_dir = train_dir
        self.online_expert = OnlineExpert(self.exp_dir / "failure_cache",
                                          self.oe_cfg)
        # Resume support: failure caches from earlier epochs must re-enter
        # the training set immediately, not only after the next harvest
        # (CreateDataset.update_data_path_trainingset merges all Cache_data
        # epochs on every rebuild, Dataloader...py:115-130).
        cached = self.online_expert.cache_dirs()
        if cached and self.train_dir is not None:
            self.train_set = load_split(self.train_dir, extra_dirs=cached,
                                        extra_repeat=self.oe_cfg.cache_repeat)

    def run_online_expert(self, epoch: int) -> int:
        """Harvest failures from a rollout over training-set cases, solve,
        cache, and rebuild the training set. Returns #cases aggregated."""
        from ..env.simulator import SimCase, rollout_batch
        import jax
        import jax.numpy as jnp

        ds = self.train_set
        # Random training-set subset per harvest (the reference rolls its
        # fixed test_trainingSet loader of num_test_trainingSet cases; a
        # rotating sample sees strictly more of the training distribution).
        rng = np.random.RandomState(self.cfg.seed + epoch)
        k = min(self.oe_cfg.num_rollouts, ds.num_cases)
        idx = rng.choice(ds.num_cases, size=k, replace=False)
        arrs = ds.sim_cases(indices=idx)
        cases = SimCase(
            grid=jnp.asarray(arrs["grid"]), starts=jnp.asarray(arrs["starts"]),
            goals=jnp.asarray(arrs["goals"]),
            target_makespan=jnp.asarray(arrs["target_makespan"]),
            target_flowtime=jnp.asarray(arrs["target_flowtime"]),
            solution_makespan=jnp.asarray(arrs["solution_makespan"]))
        rate = 3 if ds.num_agents >= 20 else self.cfg.rate_maxstep
        max_steps = int(arrs["solution_makespan"].max()) * rate
        out = rollout_batch(self.policy(), cases, max_steps,
                            self.cfg.comm_radius,
                            jax.random.PRNGKey(self.cfg.seed + epoch),
                            self.cfg.rate_maxstep)
        pool = harvest_failures(out, cases)
        saved = self.online_expert.solve_and_cache(pool, epoch)
        if saved and self.train_dir is not None:
            self.train_set = load_split(
                self.train_dir, extra_dirs=self.online_expert.cache_dirs(),
                extra_repeat=self.oe_cfg.cache_repeat)
        self.logger.log("online_expert", epoch, harvested=len(pool.grids),
                        solved=saved, train_cases=self.train_set.num_cases)
        return saved

    def post_validation(self, epoch: int) -> None:
        """OE hook on the shared validation cadence (the reference gates
        ``excuation_onlineExport`` on the same epochs,
        decentralplannerlocal_OnlineExpert.py:289-299)."""
        if epoch >= self.oe_cfg.start_epoch:
            self.run_online_expert(epoch)
