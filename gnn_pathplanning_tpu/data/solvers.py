"""Drivers for the native C++ MAPF expert solvers.

The reference shells out to prebuilt binaries over YAML files
(/root/reference/offlineExpert/CasesSolver.py:500-547 with 300 s SIGALRM
timeouts; onlineExpert/ECBS_onlineExpert.py:93-100 with 60 s). This module
keeps the same subprocess/YAML contract against our own solvers in
native/src, building them on demand, and offers a process-pool batch API for
dataset generation.
"""
from __future__ import annotations

import dataclasses
import os
import subprocess
import tempfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"

ALGOS = ("ecbs", "cbs", "prioritized", "sipp")
_BINARY_NAME = {"ecbs": "ecbs", "cbs": "cbs",
                "prioritized": "mapf_prioritized_sipp", "sipp": "sipp"}


@dataclasses.dataclass
class SolverResult:
    ok: bool
    paths: list[np.ndarray] | None = None  # per agent [T_i, 2] int
    cost: int = 0
    makespan: int = 0
    # Failure provenance (native exit codes): "ok", "infeasible" (proven —
    # exit 1), "gave_up" (solver resource bound — exit 3), "timeout"
    # (subprocess killed). The reference binaries can't distinguish these
    # (bounded only by the caller's SIGALRM); keeping them apart stops
    # harvest pipelines from silently biasing toward easy cases.
    status: str = "ok"

    def schedule_array(self) -> np.ndarray:
        """Dense [T+1, N, 2] positions (agents park at goal)."""
        t_max = max(len(p) for p in self.paths)
        n = len(self.paths)
        out = np.zeros((t_max, n, 2), np.int32)
        for i, p in enumerate(self.paths):
            out[:len(p), i] = p
            out[len(p):, i] = p[-1]
        return out


def ensure_built() -> Path:
    """Build the native solvers if needed; return the bin directory."""
    bin_dir = _NATIVE_DIR / "bin"
    if not (bin_dir / "solver").exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    return bin_dir


def write_case_yaml(path: str | os.PathLike, grid: np.ndarray,
                    starts: np.ndarray, goals: np.ndarray) -> None:
    """Write the input-YAML contract (CasesGenerator.py:267-280 format)."""
    grid = np.asarray(grid)
    with open(path, "w") as f:
        f.write("map:\n")
        f.write("    dimensions: [{}, {}]\n".format(*grid.shape))
        f.write("    obstacles:\n")
        for x, y in np.argwhere(grid > 0):
            f.write(f"    - [{x}, {y}]\n")
        f.write("agents:\n")
        for i, (s, g) in enumerate(zip(starts, goals)):
            f.write(f"  - name: agent{i}\n"
                    f"    start: [{int(s[0])}, {int(s[1])}]\n"
                    f"    goal: [{int(g[0])}, {int(g[1])}]\n")


def parse_solution_yaml(path: str | os.PathLike) -> SolverResult:
    """Parse the output-YAML contract (statistics + schedule).

    Hand-rolled line parser — the schema is fixed and this avoids a yaml
    dependency in the hot data-generation path.
    """
    cost = makespan = 0
    agents: dict[str, list[tuple[int, int, int]]] = {}
    current: list[tuple[int, int, int]] | None = None
    x = y = t = None
    with open(path) as f:
        for line in f:
            ls = line.strip()
            if ls.startswith("cost:"):
                cost = int(float(ls.split(":")[1]))
            elif ls.startswith("makespan:"):
                makespan = int(float(ls.split(":")[1]))
            elif ls.endswith(":") and not ls.startswith(("statistics", "schedule", "-")):
                current = agents.setdefault(ls[:-1], [])
            elif ls.startswith("- x:"):
                x = int(float(ls.split(":")[1]))
            elif ls.startswith("y:"):
                y = int(float(ls.split(":")[1]))
            elif ls.startswith("t:"):
                t = int(float(ls.split(":")[1]))
                if current is not None:
                    current.append((t, x, y))
    # Preserve the file's agent order (the reference keeps insertion
    # order; digit-sorting scrambled non-"agent{i}" names).
    names = list(agents)
    paths = []
    for name in names:
        steps = sorted(agents[name])
        paths.append(np.array([[sx, sy] for _, sx, sy in steps], np.int32))
    return SolverResult(ok=True, paths=paths, cost=cost, makespan=makespan)


def solve_case(grid: np.ndarray, starts: np.ndarray, goals: np.ndarray,
               algo: str = "ecbs", w: float = 1.1,
               timeout: float = 300.0,
               adaptive_w: bool = False,
               max_expansions: int | None = None,
               fallback: str | None = None) -> SolverResult:
    """Solve one MAPF instance with the native solver; SolverResult(ok=False)
    on timeout or planning failure (matching the reference's silent-skip
    semantics, ECBS_onlineExpert.py:103-104), with ``status`` recording
    whether the failure was proven infeasible or a resource give-up.

    ``adaptive_w`` (ECBS only; OFF by default for strict reference parity):
    on give-up, retry with progressively looser suboptimality (w+0.1,
    w+0.2), splitting the time budget 50/25/25 — converts heavy-tail
    timeouts into slightly-suboptimal expert solutions instead of dropping
    the case. A proven INFEASIBLE short-circuits (looser w can't help).

    ``max_expansions`` caps the (E)CBS high-level expansions (None keeps
    the binary default of 200000; 0 = unbounded, time-bounded only).
    ``fallback`` names a second algorithm tried when the primary fails
    non-infeasibly (e.g. "prioritized" — SIPP-based, orders of magnitude
    faster on congested many-agent harvests, slightly suboptimal).
    """
    if adaptive_w and algo == "ecbs":
        res = SolverResult(ok=False, status="gave_up")
        for frac, wi in ((0.5, w), (0.25, w + 0.1), (0.25, w + 0.2)):
            res = solve_case(grid, starts, goals, algo, wi,
                             max(frac * timeout, 1.0), adaptive_w=False,
                             max_expansions=max_expansions)
            if res.ok or res.status == "infeasible":
                return res
        if fallback:
            return solve_case(grid, starts, goals, fallback,
                              timeout=max(timeout * 0.25, 1.0))
        return res
    assert algo in ALGOS, algo
    bin_dir = ensure_built()
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.yaml")
        out = os.path.join(td, "out.yaml")
        write_case_yaml(inp, grid, starts, goals)
        cmd = [str(bin_dir / _BINARY_NAME[algo]), "-i", inp, "-o", out,
               "-t", str(timeout)]
        if algo == "ecbs":
            cmd += ["-w", str(w)]
        if max_expansions is not None:
            cmd += ["--max-expansions", str(max_expansions)]
        try:
            # small grace over the binary's internal -t deadline so the
            # graceful exit-3 path wins over the subprocess kill
            proc = subprocess.run(cmd, capture_output=True,
                                  timeout=timeout + 5.0)
        except subprocess.TimeoutExpired:
            res = SolverResult(ok=False, status="timeout")
        else:
            if proc.returncode == 0 and os.path.exists(out):
                return parse_solution_yaml(out)
            res = SolverResult(
                ok=False,
                status="gave_up" if proc.returncode == 3 else "infeasible")
        if fallback and res.status != "infeasible":
            fres = solve_case(grid, starts, goals, fallback,
                              timeout=max(timeout * 0.25, 1.0))
            if fres.ok:
                return fres
        return res


def _solve_one(args):
    grid, starts, goals, algo, w, timeout, adaptive_w, max_exp, fb = args
    return solve_case(grid, starts, goals, algo, w, timeout, adaptive_w,
                      max_expansions=max_exp, fallback=fb)


class ExpertSolver:
    """Concurrent batch solver. The reference uses fixed pools of 4
    multiprocessing workers (CasesSolver.py:473-483); here the parallelism
    lives in the native solver *subprocesses*, so a thread pool suffices
    (threads only write YAML and wait on the child process). This also
    avoids fork-after-threads deadlocks: the parent process typically holds
    live jax/PJRT runtime threads which make multiprocessing-fork unsafe."""

    def __init__(self, algo: str = "ecbs", w: float = 1.1,
                 timeout: float = 300.0, workers: int = 4,
                 adaptive_w: bool = False,
                 max_expansions: int | None = None,
                 fallback: str | None = None):
        self.algo = algo
        self.w = w
        self.timeout = timeout
        self.workers = workers
        self.adaptive_w = adaptive_w
        self.max_expansions = max_expansions
        self.fallback = fallback
        ensure_built()

    def solve_batch(self, grids: Sequence[np.ndarray],
                    starts: Sequence[np.ndarray],
                    goals: Sequence[np.ndarray]) -> list[SolverResult]:
        jobs = [(g, s, gl, self.algo, self.w, self.timeout, self.adaptive_w,
                 self.max_expansions, self.fallback)
                for g, s, gl in zip(grids, starts, goals)]
        if self.workers <= 1:
            return [_solve_one(j) for j in jobs]
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            return list(pool.map(_solve_one, jobs))
