"""Round-2 reference-scale dataset generation.

Mirrors the reference's dataset regime (/root/reference/offlineExpert/
DataGen_Transformer.py:35-37: 21000 train / 200 valid / 4500 test at
20x20, density p1, 10 agents) plus the generalization evaluation sets from
/root/reference/scripts/test_general_dcpOE_best_K3.sh (28x28/20ag 500,
40x40/40ag 200, 40x40/64ag 20).
"""
from __future__ import annotations

import sys
import time

from gnn_pathplanning_tpu.data.cases import generate_dataset

ROOT = sys.argv[1] if len(sys.argv) > 1 else "data2"


def gen(map_w, map_h, n_agents, splits, workers=2):
    t0 = time.time()
    counts = generate_dataset(ROOT, map_w=map_w, map_h=map_h,
                              num_agents=n_agents, density_label=1,
                              splits=splits, algo="ecbs", workers=workers,
                              seed=1337)
    print(f"{map_w}x{map_h}/{n_agents}ag: {counts} in {time.time()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    # Training regime: 21000 train / 200 valid / 4500 test (maps x cases).
    gen(20, 20, 10, {"train": (550, 40), "valid": (10, 20),
                     "test": (150, 30)})
    # Generalization evals (test split only).
    gen(28, 28, 20, {"test": (25, 20)})
    gen(40, 40, 40, {"test": (20, 10)})
    gen(40, 40, 64, {"test": (4, 5)})
    print("done", flush=True)
