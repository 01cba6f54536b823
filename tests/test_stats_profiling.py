"""Statistics analysis + profiling subsystem tests."""
import json
import time

import numpy as np
import pytest

from gnn_pathplanning_tpu.data.mapgen import load_movingai_map
from gnn_pathplanning_tpu.stats import StatisticAnalysis, load_metrics_jsonl
from gnn_pathplanning_tpu.train.profiling import (PhaseTimer,
                                                  print_device_statistics,
                                                  timeit)


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0.01
    assert s["b"]["count"] == 1
    t.reset()
    assert t.summary() == {}


def test_timeit_passthrough(capsys):
    @timeit
    def f(x):
        return x + 1
    assert f(1) == 2
    assert "[timeit] f" in capsys.readouterr().out


def test_device_statistics():
    info = print_device_statistics()
    assert info["devices"] and "platform" in info["devices"][0]


def test_movingai_loader(tmp_path):
    p = tmp_path / "bench.map"
    p.write_text("type octile\nheight 3\nwidth 4\nmap\n"
                 ".@..\n..T.\n....\n")
    grid = load_movingai_map(p)
    assert grid.shape == (3, 4)
    assert grid[0, 1] == 1 and grid[1, 2] == 1
    assert grid.sum() == 2


def test_statistic_analysis_tables_and_figures(tmp_path):
    sa = StatisticAnalysis()
    rng = np.random.RandomState(0)
    for n in (10, 20, 40):
        for k in (2, 3):
            for _ in range(3):
                sa.add({"rate_ReachGoal": 0.9 - 0.01 * n + 0.02 * k
                        + rng.randn() * 0.01,
                        "mean_deltaFT": 0.1 + 0.002 * n},
                       num_agents=n, k=k, map_w=20)
    table = sa.table("rate_ReachGoal")
    assert len(table) == 6
    assert all(r[6] == 3 for r in table)
    pytest.importorskip("matplotlib")
    f1 = sa.errorbar_vs_agents(tmp_path / "fig3.png")
    f2 = sa.generalization_heatmap(tmp_path / "fig4.png")
    f3 = sa.impact_of_k_bars(tmp_path / "fig5.png")
    assert all(f.exists() and f.stat().st_size > 0 for f in (f1, f2, f3))


def test_metrics_jsonl_roundtrip(tmp_path):
    p = tmp_path / "metrics.jsonl"
    rows = [{"kind": "test_rollout", "step": 1, "rate_ReachGoal": 0.8},
            {"kind": "train_epoch", "step": 1, "loss": 1.2}]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    assert len(load_metrics_jsonl(p)) == 2
    assert len(load_metrics_jsonl(p, "test_rollout")) == 1
    sa = StatisticAnalysis()
    assert sa.add_run_dir(tmp_path, num_agents=10, k=3, map_w=20) == 1


def test_metrics_rich_summaries(tmp_path):
    """Visualizer-parity surface: image/figure/text/histogram summaries
    land in the TB event stream (or no-op cleanly without TB)."""
    from gnn_pathplanning_tpu.train.metrics import MetricsLogger

    logger = MetricsLogger(tmp_path / "m.jsonl", tensorboard=True)
    rng = np.random.RandomState(0)
    logger.log_image("viz/map", 0, rng.rand(8, 8))
    logger.log_text("viz/note", 0, "hello")
    logger.log_histogram("viz/h", 0, rng.randn(64))
    logger.log_param_histograms(0, {"enc": {"w": rng.randn(4, 4)}})
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot([0, 1], [1, 0])
        logger.log_figure("viz/fig", 0, fig)
        plt.close(fig)
    except ImportError:
        pass
    if logger._tb is not None:
        tb_dir = tmp_path / "tb"
        assert any(tb_dir.glob("events*"))
    # disabled logger: all rich calls are no-ops
    off = MetricsLogger(tmp_path / "m2.jsonl", tensorboard=False)
    off.log_image("x", 0, rng.rand(4, 4))
    off.log_figure("x", 0, None)
    off.log_histogram("x", 0, rng.randn(8))
