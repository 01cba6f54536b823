"""Render the round-2 paper-style figures (reference Figs 3/4) from the
final evaluation summaries.

Collects `test_rollout` summaries from the eval-sweep run dirs (each
--mode test invocation writes its summary into its own timestamped
metrics.jsonl under save_root) OR from an explicit JSON file of
{label -> {set -> summary}} rows, and renders:
  artifacts/round2_errorbar.png   (Fig-3 style: success/dFT vs #agents)
  artifacts/round2_heatmap.png    (Fig-4 style: generalization grid)

Usage: python scripts/make_round2_figures.py <summaries.json|archive.json>
Accepts either a keyed multi-config test archive written by
``python -m gnn_pathplanning_tpu.stats.archive`` (detected by its "legs"
field — the preferred one-file path, mirroring the reference's
``test_summary`` aggregation) or the legacy hand-glued mapping of
{"label": {"W_N": summary, ...}} rows.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

from gnn_pathplanning_tpu.stats.analysis import StatisticAnalysis


def main():
    src = Path(sys.argv[1])
    data = json.loads(src.read_text())
    agg = StatisticAnalysis()
    if "legs" in data:  # one-file archive (stats/archive.py)
        label = str(data.get("meta", {}).get("label", "")) or "dcpOE-K3"
        n = agg.add_archive(src, label=label)
        print(f"loaded {n} legs from archive {src}")
    else:
        for label, sets in data.items():
            for key, summary in sets.items():
                map_w, n = (int(v) for v in key.split("_"))
                agg.add(summary, num_agents=n, k=3, map_w=map_w, label=label)
    out = Path("artifacts")
    out.mkdir(exist_ok=True)
    p1 = agg.errorbar_vs_agents(out / "round2_errorbar.png")
    p2 = agg.generalization_heatmap(out / "round2_heatmap.png")
    print(p1)
    print(p2)


if __name__ == "__main__":
    main()
