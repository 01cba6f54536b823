"""In-memory MAPF dataset with device-side rendering.

Capability parity with the reference dataloader
(/root/reference/dataloader/Dataloader_dcplocal_notTF_onlineExpert.py),
re-designed for TPU:

- The reference expands each case into per-timestep ``.mat`` reads through 4
  torch DataLoader workers, shipping pre-rendered [N,3,11,11] tensors + dense
  GSOs to the device every batch. Here all cases load once into padded host
  arrays; a training batch is a cheap integer gather of
  (map, goals, pos_t, action_t, radius) and the FOV/GSO render happens on
  device inside the jitted train step (see ops.fov / ops.gso).
- Step expansion semantics match ``search_target_files_withStep`` (:223-239):
  every case contributes ``makespan`` samples (steps 0..T-1).
- The online-expert merge hook matches ``update_data_path_trainingset``
  (:115-130): extra directories of failure-case records are appended to the
  training pool on (re)load.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from .transform import CaseRecord, load_record, load_reference_mat


@dataclasses.dataclass
class Batch:
    """One training batch (host arrays; device renders obs/GSO)."""
    grids: np.ndarray     # [B, W, H] float32
    goals: np.ndarray     # [B, N, 2] int32
    pos: np.ndarray       # [B, N, 2] int32
    actions: np.ndarray   # [B, N] int32 — target action indices
    radius: np.ndarray    # [B] float32


class CaseDataset:
    """A split's cases in padded arrays + a flat (case, step) sample index."""

    def __init__(self, records: Sequence[CaseRecord]):
        if not records:
            raise ValueError("empty dataset")
        self.records = list(records)
        n = records[0].num_agents
        w, h = records[0].grid.shape
        c = len(records)
        t_max = max(r.makespan for r in records)
        self.num_agents = n
        self.map_shape = (w, h)
        self.t_max = t_max

        self.grids = np.zeros((c, w, h), np.float32)
        self.goals = np.zeros((c, n, 2), np.int32)
        self.states = np.zeros((c, t_max + 1, n, 2), np.int32)
        self.actions = np.full((c, t_max, n), 4, np.int32)  # pad with stop
        self.radius = np.zeros((c,), np.float32)
        self.makespans = np.zeros((c,), np.int32)
        self.target_makespan = np.zeros((c,), np.int32)
        self.target_flowtime = np.zeros((c,), np.int32)

        sample_case, sample_step = [], []
        for i, r in enumerate(records):
            t = r.makespan
            self.grids[i] = r.grid
            self.goals[i] = r.goals
            self.states[i, :t + 1] = r.states
            self.states[i, t + 1:] = r.states[-1]
            self.actions[i, :t] = r.actions
            self.radius[i] = r.radius
            self.makespans[i] = t
            self.target_makespan[i] = r.target_makespan
            self.target_flowtime[i] = r.target_flowtime
            sample_case.extend([i] * t)
            sample_step.extend(range(t))
        self.sample_case = np.array(sample_case, np.int32)
        self.sample_step = np.array(sample_step, np.int32)

    @property
    def num_cases(self) -> int:
        return len(self.records)

    @property
    def num_samples(self) -> int:
        return len(self.sample_case)

    def gather(self, case_idx: np.ndarray, step_idx: np.ndarray) -> Batch:
        return Batch(
            grids=self.grids[case_idx],
            goals=self.goals[case_idx],
            pos=self.states[case_idx, step_idx],
            actions=self.actions[case_idx, step_idx],
            radius=self.radius[case_idx])

    def batches(self, batch_size: int, rng: np.random.RandomState,
                drop_last: bool = True) -> Iterator[Batch]:
        """Shuffled step-level batches for one epoch."""
        order = rng.permutation(self.num_samples)
        end = self.num_samples - (self.num_samples % batch_size
                                  if drop_last else 0)
        for i in range(0, end, batch_size):
            idx = order[i:i + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            yield self.gather(self.sample_case[idx], self.sample_step[idx])

    def sim_cases(self, limit: int | None = None, indices=None):
        """Case-level arrays for closed-loop evaluation (SimCase fields).

        ``indices`` selects an explicit case subset (e.g. a random sample for
        online-expert harvesting); otherwise the first ``limit`` cases.
        """
        if indices is None:
            c = self.num_cases if limit is None else min(limit, self.num_cases)
            indices = np.arange(c)
        idx = np.asarray(indices)
        return dict(
            grid=self.grids[idx], starts=self.states[idx, 0],
            goals=self.goals[idx], target_makespan=self.target_makespan[idx],
            target_flowtime=self.target_flowtime[idx],
            solution_makespan=self.makespans[idx])


class MixedDataset:
    """Interleaved step-batches from several :class:`CaseDataset` components
    of possibly DIFFERENT map sizes / agent counts — mixed-distribution
    training (a framework-native extension over the reference's fixed
    single-regime pool, aimed at the paper's Fig-4 generalization regime).

    ``batches`` yields each component's shuffled batches in a globally
    shuffled schedule proportional to the components' sample counts
    (optionally rescaled by ``weights``). Batches keep their component's
    native shapes; the jitted train step retraces once per distinct
    (map, N) shape and reuses the compiled program afterwards — agents are
    folded into the batch and the loss averages over agents, so the
    reference's loss semantics are preserved at every N.

    ``num_agents``/``map_shape`` report the PRIMARY (first) component —
    validation, online-expert harvesting, and checkpoint init follow the
    primary regime.
    """

    def __init__(self, primary: CaseDataset, *others: CaseDataset,
                 weights: Sequence[float] | None = None):
        self.components = [primary, *others]
        if weights is not None and len(weights) != len(self.components):
            raise ValueError("one weight per component required")
        self.weights = weights
        self.primary = primary
        self.num_agents = primary.num_agents
        self.map_shape = primary.map_shape

    @property
    def num_cases(self) -> int:
        return sum(c.num_cases for c in self.components)

    @property
    def num_samples(self) -> int:
        return sum(c.num_samples for c in self.components)

    def batches(self, batch_size: int, rng: np.random.RandomState,
                drop_last: bool = True) -> Iterator[Batch]:
        iters = [c.batches(batch_size, rng, drop_last)
                 for c in self.components]
        counts = [c.num_samples // batch_size for c in self.components]
        if self.weights is not None:
            # weight w rescales a component's natural batch count: w=1 keeps
            # proportional sampling, w=2 doubles its epoch share (repeating
            # shuffled passes), w=0.5 halves it.
            counts = [max(1, int(round(n * w))) if n else 0
                      for n, w in zip(counts, self.weights)]
        schedule = np.concatenate([np.full(n, i, np.int32)
                                   for i, n in enumerate(counts)])
        rng.shuffle(schedule)
        for i in schedule:
            try:
                yield next(iters[i])
            except StopIteration:
                # weighted schedules can oversubscribe a component: restart
                # its shuffled pass so epoch proportions stay as requested
                iters[i] = self.components[i].batches(batch_size, rng,
                                                      drop_last)
                yield next(iters[i])

    def sim_cases(self, limit: int | None = None, indices=None):
        """Closed-loop case arrays — primary component only (the simulator
        program is shape-specialized per regime)."""
        return self.primary.sim_cases(limit=limit, indices=indices)


def _scan_dir(path: Path, exts=(".npz", ".mat")) -> list[Path]:
    return sorted(p for p in path.rglob("*") if p.suffix in exts)


def load_split(dir_path: str | Path, limit: int | None = None,
               extra_dirs: Sequence[str | Path] = (),
               extra_repeat: int = 1,
               shard_index: int = 0, num_shards: int = 1) -> CaseDataset:
    """Load every record under ``dir_path`` (plus online-expert extras).

    ``extra_repeat`` appends the extra-dir records that many times —
    DAgger-correction oversampling (a leg-2 harvest of ~450 short failure
    cases is ~0.4% of the 1M-sample base pool, so at natural proportions
    the online-expert signal drowns; the reference merges proportionally,
    Dataloader...py:115-130, so repeat=1 is reference semantics).

    ``shard_index``/``num_shards`` give per-host dataset sharding for
    multi-host training (each host loads a disjoint stride of the file
    list); pass ``jax.process_index()`` / ``jax.process_count()``.
    """
    files: list[Path] = _scan_dir(Path(dir_path))
    extra_files: list[Path] = []
    for extra in extra_dirs:
        p = Path(extra)
        if p.is_dir():
            extra_files += _scan_dir(p)
    files += extra_files * max(1, int(extra_repeat))
    if limit is not None:
        files = files[:limit]
    if num_shards > 1:
        files = files[shard_index::num_shards]
    if not files:
        raise FileNotFoundError(
            f"no case records (*.npz / *.mat) found under {dir_path!s}"
            + (f" (+ extras {list(map(str, extra_dirs))})" if extra_dirs else "")
            + " — generate a dataset first (cli --mode gen_data)")
    cache: dict = {}
    records = []
    for f in files:
        if f not in cache:
            cache[f] = (load_record(f) if f.suffix == ".npz"
                        else load_reference_mat(f))
        records.append(cache[f])
    return CaseDataset(records)
