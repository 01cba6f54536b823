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


def test_metrics_scalar_tb_and_finalize_export(tmp_path):
    """Reference observability parity (decentralplannerlocal.py:326,661):
    scalar metrics mirror to a readable TensorBoard event stream and the
    finalize export rebuilds {tag: [[wall, step, value], ...]} JSON from
    the JSONL source of truth."""
    import json
    from gnn_pathplanning_tpu.train.metrics import MetricsLogger

    logger = MetricsLogger(tmp_path / "m.jsonl", tensorboard=True)
    for e in range(3):
        logger.log("train_epoch", e, loss=1.0 / (e + 1), lr=1e-3)
    logger.log("valid_rollout", 2, rate_ReachGoal=0.5,
               list_reachGoal=[0, 1])  # non-scalars must be skipped
    out = logger.export_scalars_json()
    logger.close()

    scalars = json.loads(out.read_text())
    assert len(scalars["train_epoch/loss"]) == 3
    assert scalars["train_epoch/loss"][0][1] == 0         # step
    assert scalars["train_epoch/loss"][2][2] == 1.0 / 3   # value
    assert "valid_rollout/rate_ReachGoal" in scalars
    assert "valid_rollout/list_reachGoal" not in scalars

    if logger._tb is not None:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator)
        acc = EventAccumulator(str(tmp_path / "tb"))
        acc.Reload()
        assert "train_epoch/loss" in acc.Tags()["scalars"]
        assert len(acc.Scalars("train_epoch/loss")) == 3


def test_multi_config_archive_roundtrip(tmp_path):
    """stats.archive: per-leg statistics .mat files aggregate into ONE keyed
    archive (the reference's test_summary shape, utils/metrics.py:204-288),
    newest-wins per configuration, dlb legs keyed separately, and
    StatisticAnalysis consumes the archive directly."""
    import time

    from gnn_pathplanning_tpu.stats.archive import (collect_statistics,
                                                    load_archive,
                                                    write_archive)
    from gnn_pathplanning_tpu.train.metrics import save_statistics_mat

    def leg(dirname, fname, rate, **meta):
        d = tmp_path / dirname / "statistics"
        d.mkdir(parents=True, exist_ok=True)
        summary = {"rate_ReachGoal": rate, "num_validset": 10,
                   "mean_deltaFT": 0.05, "hist_numAgentReachGoal": [0, 1, 9]}
        base = dict(exp_net="dcp", K=3, commRadius=7, deadlock_break=0)
        base.update(meta)
        save_statistics_mat(d / fname, summary, base)

    leg("run1", "statistics_20x20_10Agent_K3.mat", 0.80,
        map_w=20, map_h=20, num_agents=10)
    time.sleep(0.02)  # newer mtime for the re-run of the same config
    leg("run2", "statistics_20x20_10Agent_K3.mat", 0.90,
        map_w=20, map_h=20, num_agents=10)
    leg("run3", "statistics_28x28_20Agent_K3.mat", 0.70,
        map_w=28, map_h=28, num_agents=20)
    leg("run4", "statistics_20x20_10Agent_K3.mat", 0.95,
        map_w=20, map_h=20, num_agents=10, deadlock_break=3)

    legs = collect_statistics(tmp_path)
    assert set(legs) == {"TE_M20x20_10Agent_K3_comR7",
                         "TE_M28x28_20Agent_K3_comR7",
                         "TE_M20x20_10Agent_K3_comR7_dlb3"}
    # newest-wins: run2 (0.90) replaces run1 (0.80)
    assert legs["TE_M20x20_10Agent_K3_comR7"]["rate_ReachGoal"] == 0.90

    jpath, mpath = write_archive(tmp_path / "arch", legs, meta={"label": "t"})
    assert jpath.exists() and mpath.exists()
    back = load_archive(jpath)
    assert back["TE_M28x28_20Agent_K3_comR7"]["rate_ReachGoal"] == 0.70

    from gnn_pathplanning_tpu.stats.analysis import StatisticAnalysis
    agg = StatisticAnalysis()
    n = agg.add_archive(jpath, label="t")
    assert n == 2  # dlb leg excluded by default
    rows = agg.table("rate_ReachGoal")
    assert any(r[1] == 28 and abs(r[4] - 0.70) < 1e-9 for r in rows)
    assert agg.add_archive(jpath, label="t2", include_dlb=True) == 3

    import scipy.io as sio
    mat = sio.loadmat(str(mpath))
    assert any(k.startswith("M20x20_10Agent") for k in mat)
