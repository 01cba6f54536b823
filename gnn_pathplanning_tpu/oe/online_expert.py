"""Online Expert (DAgger-style) failure harvesting and data aggregation.

Capability parity with the reference's OE pipeline
(/root/reference/agents/decentralplannerlocal_OnlineExpert.py:289-309,
utils/multirobotsim_dcenlocal_onlineExpert.py:705-730,
onlineExpert/ECBS_onlineExpert.py, onlineExpert/DataTransformer_local_onlineExpert.py):

1. During the periodic rollout over training-set cases, failed cases are
   harvested as *new* MAPF problems whose starts are the agents' current
   (post-rollout) positions and whose goals are unchanged.
2. The native ECBS solves them with a 60 s per-case timeout; failures are
   skipped (ECBS_onlineExpert.py:103-104) — here with per-status counts
   logged instead of silently.
3. Solutions become training records under ``cache_dir/epoch_{e}/`` and the
   training set is rebuilt with those directories merged in
   (CreateDataset.update_data_path_trainingset semantics).

Framework extension (round-5 generalization recipe): ``gen_pools`` adds
harvest pools at OTHER regimes (e.g. 28x28/20 and 40x40/40 — the paper's
Fig-4 generalization regimes, scripts/test_general_dcpOE_best_K3.sh). Each
OE epoch additionally rolls the current policy over a sample of every gen
pool, harvests its failures, solves them (adaptive-w ECBS with a
prioritized-SIPP fallback — congested many-agent residual problems are
exactly where SIPP's interval compression pays), and mixes the per-regime
failure caches into training as weighted MixedDataset components. This
points the r4 DAgger-oversampling mechanism (docs/stall_analysis_r4.md) at
the regimes where the quality targets live.

The harvest step consumes the batched simulator's Rollout directly — no YAML
round-trip needed in-process (the YAML contract is still exercised by the
solver subprocess boundary).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from ..data.cases import CasePool
from ..data.dataset import CaseDataset, MixedDataset, load_split
from ..data.solvers import ExpertSolver
from ..data.transform import record_from_solution, save_record
from ..train.trainer import Trainer


@dataclasses.dataclass
class GenPool:
    """A generalization-regime harvest pool (framework extension)."""
    train_dir: str | Path          # solved records at the pool's regime
    num_rollouts: int = 256        # cases sampled per harvest
    comm_radius: float = 6.0       # reference protocol: commR 6 at 28/40
    weight: float = 4.0            # MixedDataset epoch-share multiplier
    timeout: float = 60.0          # per-case expert budget
    # "ecbs" (adaptive-w + prioritized fallback) or "prioritized" (pure
    # SIPP — ~100x faster on congested 64-agent residual problems, at
    # slightly suboptimal supervision; epoch-0 measurement: ECBS-adaptive
    # needed ~20 min for one 128-case 40x40/64 harvest, SIPP seconds)
    algo: str = "ecbs"


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
    # Generalization-regime harvest pools (round-5 extension; empty list =
    # reference semantics)
    gen_pools: list = dataclasses.field(default_factory=list)
    # Harvest-solver escalation for gen pools: adaptive-w ECBS (50/25/25
    # budget at w/w+.1/w+.2), prioritized-SIPP fallback, no expansion cap
    adaptive: bool = True


def harvest_failures(rollout, cases, counts: dict | None = None) -> CasePool:
    """Failed cases -> new MAPF problems from current positions.

    ``rollout``: batched env.Rollout; ``cases``: the SimCase batch it ran on.
    An agent already at its goal keeps its position (== goal) as its start,
    exactly like the reference dump of current predicted positions
    (multirobotsim_dcenlocal_onlineExpert.py:705-730).

    ``counts`` (optional dict) receives {"failed", "dropped_overlap"} so
    callers can log drops instead of losing them silently — a sudden
    nonzero drop count is the canary for a shield regression that starts
    producing overlapping final positions.
    """
    failed = ~np.asarray(rollout.metrics.all_reached)
    grids = np.asarray(cases.grid)
    goals = np.asarray(cases.goals)
    final_pos = np.asarray(rollout.final_pos)
    pool = CasePool([], [], [], [], [])
    dropped = 0
    for i in np.nonzero(failed)[0]:
        # Distinct-position invariant is maintained by collision shielding,
        # but a degenerate overlap would make the case unsolvable; skip those.
        if len({tuple(p) for p in final_pos[i]}) != final_pos.shape[1]:
            dropped += 1
            continue
        pool.grids.append(grids[i])
        pool.starts.append(final_pos[i].astype(np.int32))
        pool.goals.append(goals[i].astype(np.int32))
        pool.map_ids.append(int(i))
        pool.case_ids.append(int(i))
    if counts is not None:
        counts["failed"] = int(failed.sum())
        counts["dropped_overlap"] = dropped
    return pool


class OnlineExpert:
    def __init__(self, cache_dir: str | Path, cfg: OnlineExpertConfig,
                 timeout: float | None = None, comm_radius: float | None = None,
                 algo: str = "ecbs"):
        self.cache_dir = Path(cache_dir)
        self.cfg = cfg
        self.comm_radius = (cfg.comm_radius if comm_radius is None
                            else comm_radius)
        kw = {}
        if cfg.adaptive and algo == "ecbs":
            # unbounded HL expansions (time-bounded only) + w escalation +
            # SIPP fallback: no silent give-ups biasing the cache toward
            # easy cases (r4 verdict missing #3)
            kw = dict(adaptive_w=True, max_expansions=0,
                      fallback="prioritized")
        self.solver = ExpertSolver(
            algo=algo, w=1.1,
            timeout=cfg.timeout if timeout is None else timeout,
            workers=cfg.workers, **kw)

    def solve_and_cache(self, pool: CasePool, epoch: int,
                        stats: dict | None = None) -> int:
        """ECBS the harvested failures; write records for epoch `epoch`.

        ``stats`` (optional dict) receives per-status solve counts
        ({"ok", "infeasible", "gave_up", "timeout"}).
        """
        if not pool.grids:
            return 0
        out = self.cache_dir / f"epoch_{epoch}"
        out.mkdir(parents=True, exist_ok=True)
        results = self.solver.solve_batch(pool.grids, pool.starts, pool.goals)
        saved = 0
        for res, grid, goals, cid in zip(results, pool.grids, pool.goals,
                                         pool.case_ids):
            if stats is not None:
                stats[res.status] = stats.get(res.status, 0) + 1
            if not res.ok or res.paths is None:
                continue
            sched = res.schedule_array()
            if sched.shape[0] < 2:
                continue
            rec = record_from_solution(grid, goals, sched, self.comm_radius)
            save_record(out / f"train_IDCase{cid}_MP{rec.makespan}.npz", rec)
            saved += 1
        return saved

    def cache_dirs(self) -> list[Path]:
        return sorted(p for p in self.cache_dir.glob("epoch_*") if p.is_dir())


class OnlineExpertTrainer(Trainer):
    """Trainer + the OE epoch hook (excuation_onlineExport semantics:
    gated on Start_onlineExpert and the validation cadence). With
    ``oe_cfg.gen_pools`` set, every OE epoch additionally harvests at each
    generalization regime and mixes the per-regime failure caches into the
    training pool (weighted MixedDataset components)."""

    def __init__(self, *args, oe_cfg: OnlineExpertConfig | None = None,
                 train_dir: str | Path | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.oe_cfg = oe_cfg or OnlineExpertConfig()
        self.train_dir = train_dir
        self.online_expert = OnlineExpert(self.exp_dir / "failure_cache",
                                          self.oe_cfg)
        # Gen-regime pools: experts + loaded rollout datasets.
        self.gen_experts: list[OnlineExpert] = []
        self.gen_sets: list[CaseDataset] = []
        for i, gp in enumerate(self.oe_cfg.gen_pools):
            self.gen_experts.append(
                OnlineExpert(self.exp_dir / f"failure_cache_gen{i}",
                             self.oe_cfg, timeout=gp.timeout,
                             comm_radius=gp.comm_radius, algo=gp.algo))
            self.gen_sets.append(load_split(gp.train_dir))
        # Resume support: failure caches from earlier epochs must re-enter
        # the training set immediately, not only after the next harvest
        # (CreateDataset.update_data_path_trainingset merges all Cache_data
        # epochs on every rebuild, Dataloader...py:115-130).
        if self.train_dir is not None and (
                self.online_expert.cache_dirs()
                or any(e.cache_dirs() for e in self.gen_experts)):
            self._rebuild_train_set()

    def _rebuild_train_set(self) -> None:
        """Primary train dir + primary OE caches (repeat-merged), plus one
        weighted MixedDataset component per non-empty gen-regime cache."""
        assert self.train_dir is not None
        primary = load_split(self.train_dir,
                             extra_dirs=self.online_expert.cache_dirs(),
                             extra_repeat=self.oe_cfg.cache_repeat)
        components, weights = [], [1.0]
        for gp, expert in zip(self.oe_cfg.gen_pools, self.gen_experts):
            dirs = expert.cache_dirs()
            if not dirs:
                continue
            components.append(load_split(expert.cache_dir))
            weights.append(gp.weight)
        if components:
            self.train_set = MixedDataset(primary, *components,
                                          weights=weights)
        else:
            self.train_set = primary

    def _harvest_one(self, ds, expert: OnlineExpert, num_rollouts: int,
                     comm_radius: float, epoch: int, label: str) -> int:
        """Roll the current policy over a sample of ``ds``, harvest failed
        cases, solve, and cache under ``expert``. Returns #cases cached."""
        from ..env.simulator import SimCase, rollout_batch
        import jax
        import jax.numpy as jnp

        rng = np.random.RandomState(self.cfg.seed + epoch)
        k = min(num_rollouts, ds.num_cases)
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
        out = rollout_batch(self.policy(), cases, max_steps, comm_radius,
                            jax.random.PRNGKey(self.cfg.seed + epoch),
                            self.cfg.rate_maxstep)
        counts: dict = {}
        pool = harvest_failures(out, cases, counts)
        stats: dict = {}
        saved = expert.solve_and_cache(pool, epoch, stats)
        self.logger.log("online_expert", epoch, pool=label,
                        rolled=int(k), harvested=len(pool.grids),
                        solved=saved, **{f"n_{k2}": v
                                         for k2, v in counts.items()},
                        **{f"solve_{k2}": v for k2, v in stats.items()})
        return saved

    def run_online_expert(self, epoch: int) -> int:
        """Harvest failures (primary regime + every gen pool), solve, cache,
        and rebuild the training set. Returns #cases aggregated."""
        ds = self.train_set
        primary_ds = ds.primary if isinstance(ds, MixedDataset) else ds
        saved = self._harvest_one(primary_ds, self.online_expert,
                                  self.oe_cfg.num_rollouts,
                                  self.cfg.comm_radius, epoch, "primary")
        for i, (gp, expert, gds) in enumerate(zip(
                self.oe_cfg.gen_pools, self.gen_experts, self.gen_sets)):
            saved += self._harvest_one(gds, expert, gp.num_rollouts,
                                       gp.comm_radius, epoch, f"gen{i}")
        if saved and self.train_dir is not None:
            self._rebuild_train_set()
            self.logger.log("online_expert_pool", epoch,
                            train_cases=self.train_set.num_cases)
        return saved

    def post_validation(self, epoch: int) -> None:
        """OE hook on the shared validation cadence (the reference gates
        ``excuation_onlineExport`` on the same epochs,
        decentralplannerlocal_OnlineExpert.py:289-299)."""
        if epoch >= self.oe_cfg.start_epoch:
            self.run_online_expert(epoch)
