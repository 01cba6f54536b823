#!/bin/bash
# Round-5 leg 2: short gen-OE push from the leg-1 winner (swa_last4).
# Two official rows sit within CI distance of their targets (in-dist
# 0.9268 vs >= 0.93, 40x40/40 0.165 vs >= 0.20) — this leg doubles the
# 40x40/40 harvest share (rollouts 320, weight 6) and keeps everything
# else from leg 1. 12-epoch cosine at a gentler lr.
# Usage: scripts/round5_leg2.sh <pretrained.msgpack> [max_epoch]
set -eu
PRETRAINED="$1"
MAX_EPOCH="${2:-12}"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
[ -f "$PRETRAINED" ] || { echo "missing pretrained: $PRETRAINED" >&2; exit 1; }

TS=$(date +%s)
FLAGS=(configs/dcp_oeheavy.json --mode train --data_augment
       --max_epoch "$MAX_EPOCH" --learning_rate 7e-5
       --pretrained "$PRETRAINED" --log_time_trained "$TS"
       --oe_gen_pools "data_mix/map28x28_density_p1/20_Agent/train,data_mix/map40x40_density_p1/40_Agent/train,data_mix/map40x40_density_p1/64_Agent/train"
       --oe_gen_rollouts "256,320,128"
       --oe_gen_commR "6,6,11"
       --oe_gen_algos "ecbs,ecbs,prioritized"
       --oe_gen_weight 6 --oe_gen_timeout 60)
echo "launching round-5 leg-2 at ts=$TS from $PRETRAINED"
nohup python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > "/tmp/oegen2_$TS.log" 2>&1 &
PID=$!
EXP="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/$TS"
echo "train pid=$PID exp=$EXP log=/tmp/oegen2_$TS.log"
nohup scripts/train_watchdog.sh "$PID" "$EXP" "$MAX_EPOCH" 2400 -- \
  python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" --con_train \
  > "/tmp/oegen2_watchdog_$TS.log" 2>&1 &
echo "watchdog pid=$!"
echo "$TS" > /tmp/leg2_ts.txt
