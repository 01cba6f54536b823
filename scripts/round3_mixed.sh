#!/bin/bash
# Round-3 mixed-distribution leg (framework-native experiment, reported
# SEPARATELY from the reference-recipe line): short cosine fine-tune from
# the best selected checkpoint on the 20x20/10 pool MIXED with 2,980 fresh
# 28x28/20 ECBS cases (weight 2 -> ~20% epoch share) and 1,200 fresh
# 40x40/40 cases (weight 2; seed 616161, disjoint from every eval pool),
# D4 augmentation, no online expert (MixedDataset is incompatible with
# the OE rebuild).
# Target: lift the paper-regime generalization (VERDICT r2 item 2).
#
# Usage: scripts/round3_mixed.sh <pretrained.msgpack>
set -eu
PRETRAINED="$1"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
[ -f "$PRETRAINED" ] || { echo "missing pretrained: $PRETRAINED" >&2; exit 1; }
[ -d data_mix/map28x28_density_p1/20_Agent/train ] || {
  echo "data_mix 28x28 missing (see ROUND3.md)" >&2; exit 1; }
[ -d data_mix/map40x40_density_p1/40_Agent/train ] || {
  echo "data_mix 40x40 missing: regenerate with the seeded recipe in" \
       "ROUND3.md (generate_dataset data_mix 40x40/40ag seed=616161)" >&2
  exit 1; }

TS=$(date +%s)
FLAGS=(configs/dcp_mixed.json --mode train --data_augment
       --mix_train_dirs data_mix/map28x28_density_p1/20_Agent/train,data_mix/map40x40_density_p1/40_Agent/train
       --mix_weights 1,2,2
       --pretrained "$PRETRAINED" --log_time_trained "$TS")
echo "launching mixed leg at ts=$TS from $PRETRAINED"
nohup python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > "/tmp/mixed_$TS.log" 2>&1 &
PID=$!
EXP="experiments_r2/dcpmix_map20x20_rho1_10Agent/K3_HS0/$TS"
echo "train pid=$PID exp=$EXP log=/tmp/mixed_$TS.log"
nohup scripts/train_watchdog.sh "$PID" "$EXP" 24 1500 -- \
  python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" --con_train \
  > "/tmp/mixed_watchdog_$TS.log" 2>&1 &
echo "watchdog pid=$!"
