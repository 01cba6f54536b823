#!/bin/bash
# Round-5 impact-of-K sweep (r4 verdict "Next round" #6): the reference
# trains K in {1,2,3} (scripts/train_dcp_DMap.sh) and Fig 5 compares them
# (statistic_analysis/result_analysis_errorbar.py:298). This repo had the
# analysis code + train scripts but only K=3 checkpoints — train K=1/K=2/
# K=3 siblings with an IDENTICAL equal-budget recipe (short legs: the
# comparison between Ks is the target, not each leg's absolute ceiling;
# budget recorded in the archive) and evaluate each on the official pools.
# Usage: scripts/round5_ksweep.sh [epochs] [testset]
#
# Budget actually run (round 5): 16 epochs over a dedicated 3,960-case
# 20x20/10 train set (data_ksweep, seed 888001 — a fresh stream so sweep
# train maps are disjoint from every official 1337 eval pool), lr/batch
# from configs/dcp_ECBS.json, no OE. Evaluation on the official data2
# pools. The K ordering is the target, not each leg's absolute ceiling.
set -eu
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
EPOCHS="${1:-16}"
TESTSET="${2:-1110}"

# Dedicated small train root (generated if absent).
if [ ! -d data_ksweep/map20x20_density_p1/10_Agent/train ]; then
  python - <<'EOF'
from gnn_pathplanning_tpu.data.cases import generate_dataset
print(generate_dataset("data_ksweep", map_w=20, map_h=20, num_agents=10,
                       density_label=1,
                       splits={"train": (100, 40), "valid": (10, 20)},
                       algo="ecbs", workers=2, seed=888001))
EOF
fi

# Isolated save root so the Fig-5 archive sees ONLY the equal-budget
# sweep legs (the flagship K=3 in experiments_r2 has a far larger budget
# + OE — mixing it in would confound the K comparison).
SWEEP_ROOT=experiments_ksweep
mkdir -p "$SWEEP_ROOT"

for K in 1 2 3; do
  TS=$(date +%s)
  echo "=== K=$K leg at ts=$TS (epochs=$EPOCHS) ==="
  timeout 7200 python -m gnn_pathplanning_tpu.cli.main \
      configs/dcp_ECBS.json --mode train \
      --data_root data_ksweep --save_root experiments_ksweep \
      --nGraphFilterTaps "$K" --max_epoch "$EPOCHS" \
      --log_time_trained "$TS" --seed 1337 \
      2>&1 | grep -v WARNING | tail -2
  CKPT="experiments_ksweep/dcp_map20x20_rho1_10Agent/K${K}_HS0/$TS/checkpoints/model_best.msgpack"
  [ -f "$CKPT" ] || CKPT="experiments_ksweep/dcp_map20x20_rho1_10Agent/K${K}_HS0/$TS/checkpoints/checkpoint.msgpack"
  echo "--- eval K=$K: in-dist ($TESTSET) + 28x28/20 (500) ---"
  timeout 3600 python -m gnn_pathplanning_tpu.cli.main \
      configs/dcp_ECBS.json --mode test --test_checkpoint "$CKPT" \
      --nGraphFilterTaps "$K" --num_testset "$TESTSET" \
      --data_root data2 --save_root experiments_ksweep \
      2>&1 | grep -v WARNING | tail -1
  timeout 3600 python -m gnn_pathplanning_tpu.cli.main \
      --mode test --test_checkpoint "$CKPT" \
      --nGraphFilterTaps "$K" --map_w 28 --map_h 28 --num_agents 20 \
      --num_testset 500 --data_root data2 --save_root experiments_ksweep \
      2>&1 | grep -v WARNING | tail -1
done

echo "=== Fig-5 artifact ==="
timeout 600 python -m gnn_pathplanning_tpu.stats.archive experiments_ksweep \
  -o artifacts/ksweep_archive_r5 --label ksweep-r5 2>&1 | grep -v WARNING
timeout 600 python - <<'EOF'
from gnn_pathplanning_tpu.stats.analysis import StatisticAnalysis
sa = StatisticAnalysis()
n = sa.add_archive("artifacts/ksweep_archive_r5.json", label="ksweep-r5")
print("archive legs loaded:", n)
sa.impact_of_k_bars("artifacts/round5_impact_of_k.png")
print("wrote artifacts/round5_impact_of_k.png")
EOF
echo "ksweep done at $(date -u)"
