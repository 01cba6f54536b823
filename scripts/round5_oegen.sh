#!/bin/bash
# Round-5 generalization OE leg (VERDICT r4 "Next round" #1): the r4
# OE-heavy mechanism (DAgger failure harvesting with cache oversampling,
# docs/stall_analysis_r4.md) pointed at the regimes where the quality
# targets live — harvest pools at 28x28/20, 40x40/40 and 40x40/64
# (commR 11) in addition to the primary 20x20/10 training pool. Each
# regime's failure cache becomes a weighted MixedDataset component.
# The expert solver escalates (adaptive-w ECBS -> prioritized SIPP, no
# expansion cap) so hard harvests aren't silently dropped.
# Usage: scripts/round5_oegen.sh <pretrained.msgpack> [max_epoch]
set -eu
PRETRAINED="$1"
MAX_EPOCH="${2:-24}"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
[ -f "$PRETRAINED" ] || { echo "missing pretrained: $PRETRAINED" >&2; exit 1; }
[ -d data_mix/map28x28_density_p1/20_Agent/train ] || {
  echo "missing 28x28 harvest pool (data_mix)" >&2; exit 1; }
[ -d data_mix/map40x40_density_p1/40_Agent/train ] || {
  echo "missing 40x40/40 harvest pool (data_mix)" >&2; exit 1; }
[ -d data_mix/map40x40_density_p1/64_Agent/train ] || {
  echo "missing 40x40/64 harvest pool (data_mix)" >&2; exit 1; }
[ -d data4/map20x20_density_p1/10_Agent/train ] || {
  echo "data4 missing; run scripts/gen_round2_data.py data2 then" \
       "scripts/gen_finetune2_data.py data2" >&2; exit 1; }

TS=$(date +%s)
FLAGS=(configs/dcp_oeheavy.json --mode train --data_augment
       --max_epoch "$MAX_EPOCH"
       --pretrained "$PRETRAINED" --log_time_trained "$TS"
       --oe_gen_pools "data_mix/map28x28_density_p1/20_Agent/train,data_mix/map40x40_density_p1/40_Agent/train,data_mix/map40x40_density_p1/64_Agent/train"
       --oe_gen_rollouts "320,224,128"
       --oe_gen_commR "6,6,11"
       --oe_gen_weight 4 --oe_gen_timeout 60)
echo "launching round-5 gen-OE leg at ts=$TS from $PRETRAINED"
nohup python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > "/tmp/oegen_$TS.log" 2>&1 &
PID=$!
EXP="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/$TS"
echo "train pid=$PID exp=$EXP log=/tmp/oegen_$TS.log"
nohup scripts/train_watchdog.sh "$PID" "$EXP" "$MAX_EPOCH" 2400 -- \
  python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" --con_train \
  > "/tmp/oegen_watchdog_$TS.log" 2>&1 &
echo "watchdog pid=$!"
