"""Result aggregation and paper-figure reproduction.

Capability parity with /root/reference/statistic_analysis/ (5 scripts,
SURVEY §2 row 26): loads per-run summary records and reproduces the paper's
analysis figures — success-rate / flowtime-deterioration error bars vs agent
count (Fig 3), the generalization heatmap over (trained-on, tested-on)
configurations (Fig 4), and the impact-of-K histograms (Fig 5). Input is the
framework's JSONL metrics stream (train.metrics.MetricsLogger) instead of
TensorBoard + ``.mat`` archives; the metric keys match the reference's
``save_statistics`` dict ('rate_ReachGoal', 'mean_deltaFT', ...).
"""
from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np


def load_metrics_jsonl(path: str | Path, kind: str | None = None) -> list[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if kind is None or rec.get("kind") == kind:
                rows.append(rec)
    return rows


class StatisticAnalysis:
    """Aggregate summaries across runs keyed by experiment metadata."""

    def __init__(self):
        # rows: {metadata key -> list of summary dicts}
        self.rows: dict[tuple, list[dict]] = defaultdict(list)

    def add(self, summary: dict, *, num_agents: int, k: int,
            map_w: int, label: str = "") -> None:
        self.rows[(label, map_w, num_agents, k)].append(summary)

    def add_archive(self, path: str | Path, label: str = "",
                    include_dlb: bool = False) -> int:
        """Feed every leg of a keyed multi-config test archive
        (:mod:`.archive`) directly — the reference's one-file
        ``test_summary`` consumption path. Deadlock-break legs are
        framework-native and excluded unless ``include_dlb``."""
        from .archive import load_archive
        count = 0
        for key, rec in load_archive(path).items():
            if int(rec.get("deadlock_break", 0) or 0) and not include_dlb:
                continue
            self.add(rec, num_agents=int(rec["num_agents"]),
                     k=int(rec.get("K", 0)), map_w=int(rec["map_w"]),
                     label=label or str(rec.get("exp_net", "")))
            count += 1
        return count

    def add_run_dir(self, exp_dir: str | Path, *, num_agents: int, k: int,
                    map_w: int, label: str = "",
                    kind: str = "test_rollout") -> int:
        path = Path(exp_dir) / "metrics.jsonl"
        if not path.exists():
            return 0
        rows = load_metrics_jsonl(path, kind)
        for r in rows:
            self.add(r, num_agents=num_agents, k=k, map_w=map_w, label=label)
        return len(rows)

    def table(self, metric: str = "rate_ReachGoal"):
        """[(label, map_w, num_agents, k, mean, std, n)] sorted rows."""
        out = []
        for key in sorted(self.rows):
            vals = np.array([r[metric] for r in self.rows[key]
                             if metric in r], np.float64)
            if len(vals) == 0:
                continue
            out.append((*key, float(vals.mean()),
                        float(vals.std(ddof=1)) if len(vals) > 1 else 0.0,
                        len(vals)))
        return out

    # ------------------------------------------------------------ figures
    def errorbar_vs_agents(self, out_path: str | Path,
                           metrics=("rate_ReachGoal", "mean_deltaFT")):
        """Fig-3 style: metric vs #agents with std error bars, one line per
        (label, K)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(metrics), figsize=(6 * len(metrics), 4))
        if len(metrics) == 1:
            axes = [axes]
        for ax, metric in zip(axes, metrics):
            series = defaultdict(list)
            for row in self.table(metric):
                label, map_w, n, k, mean, std, _ = row
                series[(label, k)].append((n, mean, std))
            for (label, k), pts in sorted(series.items()):
                pts.sort()
                ns, means, stds = zip(*pts)
                ax.errorbar(ns, means, yerr=stds, marker="o",
                            label=f"{label} K={k}", capsize=3)
            ax.set_xlabel("# agents")
            ax.set_ylabel(metric)
            ax.grid(alpha=0.3)
            ax.legend()
        fig.savefig(out_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return Path(out_path)

    def generalization_heatmap(self, out_path: str | Path,
                               metric: str = "rate_ReachGoal"):
        """Fig-4 style: metric over the (map size, #agents) test grid."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rows = self.table(metric)
        sizes = sorted({r[1] for r in rows})
        agents = sorted({r[2] for r in rows})
        grid = np.full((len(sizes), len(agents)), np.nan)
        for _, map_w, n, _, mean, _, _ in rows:
            grid[sizes.index(map_w), agents.index(n)] = mean
        fig, ax = plt.subplots(figsize=(6, 4))
        im = ax.imshow(grid, cmap="viridis", aspect="auto")
        ax.set_xticks(range(len(agents)), agents)
        ax.set_yticks(range(len(sizes)), [f"{s}x{s}" for s in sizes])
        ax.set_xlabel("# agents")
        ax.set_ylabel("map")
        for i in range(len(sizes)):
            for j in range(len(agents)):
                if not np.isnan(grid[i, j]):
                    ax.text(j, i, f"{grid[i, j]:.2f}", ha="center",
                            va="center", color="w")
        fig.colorbar(im, label=metric)
        fig.savefig(out_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return Path(out_path)

    def impact_of_k_bars(self, out_path: str | Path,
                         metric: str = "rate_ReachGoal"):
        """Fig-5 style: metric grouped by K."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rows = self.table(metric)
        ks = sorted({r[3] for r in rows})
        groups = sorted({(r[0], r[2]) for r in rows})
        width = 0.8 / max(len(ks), 1)
        fig, ax = plt.subplots(figsize=(6, 4))
        for i, k in enumerate(ks):
            xs, ys, es = [], [], []
            for g, (label, n) in enumerate(groups):
                match = [r for r in rows if r[3] == k and (r[0], r[2]) == (label, n)]
                if match:
                    xs.append(g + i * width)
                    ys.append(match[0][4])
                    es.append(match[0][5])
            ax.bar(xs, ys, width=width, yerr=es, label=f"K={k}", capsize=3)
        ax.set_xticks([g + 0.4 - width / 2 for g in range(len(groups))],
                      [f"{label or 'dcp'} N={n}" for label, n in groups])
        ax.set_ylabel(metric)
        ax.legend()
        ax.grid(alpha=0.3, axis="y")
        fig.savefig(out_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return Path(out_path)
