"""Regenerate ONLY the evaluation pools (official seed-1337 test splits +
seed-515151 held-out generalization valid2 pools).

The full training-scale regeneration lives in scripts/gen_round2_data.py;
this script restores just what eval sweeps need after a container recycle
(~1-2 min of ECBS time instead of ~5). It also makes the seed-515151
valid2 pool recipe reproducible in-tree — round 3/4 generated those pools
from an uncommitted one-off command (VERDICT r3 weak #7 class of problem).

Official test splits mirror the reference protocol
(/root/reference/scripts/test_general_dcpOE_best_K3.sh): 28x28/20ag 500,
40x40/40ag 200, 40x40/64ag commR11 20 (+ the random-map 64-agent line).
"""
from __future__ import annotations

import sys
import time

from gnn_pathplanning_tpu.data.cases import generate_dataset

ROOT = sys.argv[1] if len(sys.argv) > 1 else "data2"


def gen(map_w, map_h, n_agents, splits, seed=1337, map_type="map",
        workers=2):
    t0 = time.time()
    counts = generate_dataset(ROOT, map_w=map_w, map_h=map_h,
                              num_agents=n_agents, density_label=1,
                              splits=splits, algo="ecbs", workers=workers,
                              seed=seed, map_type=map_type)
    print(f"{map_w}x{map_h}/{n_agents}ag seed={seed} {map_type}: "
          f"{counts} in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    # Official seed-1337 test pools (reference generalization protocol).
    gen(20, 20, 10, {"test": (150, 30)})
    gen(28, 28, 20, {"test": (25, 20)})
    gen(40, 40, 40, {"test": (20, 10)})
    gen(40, 40, 64, {"test": (4, 5)})
    gen(40, 40, 64, {"test": (4, 5)}, map_type="random")
    # Statistically meaningful 64-agent pools (r4 verdict: a target row
    # cannot rest on n=20). Same seed + protocol, 40 maps x 5 cases: the
    # map/case stream is drawn sequentially from seed 1337, so the official
    # 20-case pool is exactly the first-4-maps PREFIX of this 200-case pool
    # ("test_big" split; report official line on both, with binomial CIs).
    gen(40, 40, 64, {"test_big": (40, 5)})
    gen(40, 40, 64, {"test_big": (40, 5)}, map_type="random")
    # In-dist selection pool (seed 424242, same as gen_round2_data.py).
    gen(20, 20, 10, {"valid2": (30, 20)}, seed=424242)
    # Held-out generalization valid2 pools (seed 515151, maps disjoint
    # from every 1337 test pool; sweeps/selection only, never reported).
    gen(28, 28, 20, {"valid2": (18, 20)}, seed=515151)
    gen(40, 40, 40, {"valid2": (29, 10)}, seed=515151)
    gen(40, 40, 64, {"valid2": (8, 5)}, seed=515151)
    gen(40, 40, 64, {"valid2": (8, 5)}, seed=515151, map_type="random")
    print("done", flush=True)
