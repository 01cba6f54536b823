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


def gen(map_w, map_h, n_agents, splits, workers=2, seed=1337,
        map_type="map"):
    t0 = time.time()
    counts = generate_dataset(ROOT, map_w=map_w, map_h=map_h,
                              num_agents=n_agents, density_label=1,
                              splits=splits, algo="ecbs", workers=workers,
                              seed=seed, map_type=map_type)
    print(f"{map_w}x{map_h}/{n_agents}ag: {counts} in {time.time()-t0:.0f}s",
          flush=True)


def build_data3(root: str) -> None:
    """data3 = train + train2 merged by symlink (fine-tune dataset), with
    valid/valid2/test shared from `root`."""
    import os
    from pathlib import Path
    base = Path(root).resolve() / "map20x20_density_p1" / "10_Agent"
    dst = Path("data3") / "map20x20_density_p1" / "10_Agent"
    train = dst / "train"
    train.mkdir(parents=True, exist_ok=True)
    for f in (base / "train").glob("*.npz"):
        link = train / f.name
        if not link.exists():
            link.symlink_to(f)
    for f in (base / "train2").glob("*.npz"):
        link = train / f"extra2_{f.name}"
        if not link.exists():
            link.symlink_to(f)
    for s in ("valid", "valid2", "test"):
        link = dst / s
        if link.is_symlink():
            link.unlink()
        os.symlink(base / s, link)


if __name__ == "__main__":
    # Training regime: 21000 train / 200 valid / 4500 test (maps x cases).
    gen(20, 20, 10, {"train": (550, 40), "valid": (10, 20),
                     "test": (150, 30)})
    # Generalization evals (test split only).
    gen(28, 28, 20, {"test": (25, 20)})
    gen(40, 40, 40, {"test": (20, 10)})
    gen(40, 40, 64, {"test": (4, 5)})
    # BMAP-family 64-agent set: uniform-random obstacle maps, matching the
    # reference's --map_type random generalization line.
    gen(40, 40, 64, {"test": (4, 5)}, map_type="random")
    # Round-2 second half: fresh checkpoint-selection pool (disjoint maps,
    # own seed; the test split stays untouched by selection) + 10k extra
    # train cases for the fine-tune phase, merged into data3.
    gen(20, 20, 10, {"valid2": (30, 20)}, seed=424242)
    gen(20, 20, 10, {"train2": (250, 40)}, seed=777001)
    build_data3(ROOT)
    print("done", flush=True)
