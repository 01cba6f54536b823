"""Tracing and per-phase timing.

Capability parity with the reference's manual instrumentation — wall-clock
timers around every rollout phase collected per step and persisted with the
statistics (agents/decentralplannerlocal.py:537-592,627;
utils/metrics.py:127-128,264-265; the ``timeit`` decorator in
utils/misc.py:5-17) — plus TPU-native profiler traces via ``jax.profiler``
(the replacement for ``print_cuda_statistics``' nvidia-smi shelling).
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from pathlib import Path


class PhaseTimer:
    """Accumulates wall-time per named phase; summary() mirrors the
    reference's per-phase time record."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def wrap(self, name: str, fn):
        @functools.wraps(fn)
        def inner(*a, **k):
            with self.phase(name):
                return fn(*a, **k)
        return inner

    def summary(self) -> dict:
        return {name: {"total_s": self.totals[name],
                       "count": self.counts[name],
                       "mean_s": self.totals[name] / max(self.counts[name], 1)}
                for name in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()


def timeit(fn):
    """Decorator printing call duration (reference utils/misc.py:5-17)."""
    @functools.wraps(fn)
    def inner(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        print(f"[timeit] {fn.__name__}: {time.perf_counter() - t0:.4f}s")
        return out
    return inner


@contextlib.contextmanager
def device_trace(log_dir: str | Path):
    """jax.profiler trace scope — view with TensorBoard/XProf. The TPU-era
    replacement for the reference's CUDA statistics dump."""
    import jax
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_device_statistics(logger=None) -> dict:
    """Device inventory + memory stats (replacement for
    print_cuda_statistics, utils/misc.py:21-36)."""
    import jax
    info = []
    for d in jax.devices():
        entry = {"id": d.id, "kind": d.device_kind,
                 "platform": d.platform}
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            entry["bytes_in_use"] = stats.get("bytes_in_use")
            entry["bytes_limit"] = stats.get("bytes_limit")
        info.append(entry)
    emit = logger.info if logger else print
    for e in info:
        emit(f"device {e}")
    return {"devices": info}
