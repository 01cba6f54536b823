"""Fine-tune leg-2 dataset: data4 = data3 (31,880 cases) + 10k fresh
20x20/10ag train cases (train3, own seed), sharing valid/valid2/test.

Run after scripts/gen_round2_data.py (containers wipe gitignored data).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gnn_pathplanning_tpu.data.cases import generate_dataset

ROOT = sys.argv[1] if len(sys.argv) > 1 else "data2"

t0 = time.time()
counts = generate_dataset(ROOT, map_w=20, map_h=20, num_agents=10,
                          density_label=1, splits={"train3": (250, 40)},
                          algo="ecbs", workers=2, seed=888001)
print(f"train3: {counts} in {time.time()-t0:.0f}s", flush=True)

base = Path(ROOT).resolve() / "map20x20_density_p1" / "10_Agent"
dst = Path("data4") / "map20x20_density_p1" / "10_Agent"
train = dst / "train"
train.mkdir(parents=True, exist_ok=True)
for prefix, split in (("", "train"), ("extra2_", "train2"),
                      ("extra3_", "train3")):
    for f in (base / split).glob("*.npz"):
        link = train / f"{prefix}{f.name}"
        if not link.exists():
            link.symlink_to(f)
for s in ("valid", "valid2", "test"):
    link = dst / s
    if link.is_symlink():
        link.unlink()
    os.symlink(base / s, link)
n = len(list(train.glob("*.npz")))
print(f"data4 train cases: {n}", flush=True)
