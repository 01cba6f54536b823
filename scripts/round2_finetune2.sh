#!/bin/bash
# Fine-tune leg 2 (round 2 second half): start from leg 1's selected
# checkpoint (SWA-last4, 0.9065 on the 4,440-case test), cosine restart at
# lr 1.25e-4 for 60 epochs on data4 (data3 + 10k fresh train3 cases), D4
# augmentation, online expert with the widened 2,500-rollout harvest.
# Launches under the stale-heartbeat watchdog and chains post_train_r2b
# (valid2 selection -> eval sweep -> tpu tests -> bench).
#
# Usage: scripts/round2_finetune2.sh <leg1_exp_dir>
set -eu
LEG1="${1:-experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/1787138167}"
PRETRAINED="$LEG1/checkpoints/model_selected.msgpack"
[ -f "$PRETRAINED" ] || PRETRAINED="$LEG1/checkpoints/model_best.msgpack"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# data must exist (containers wipe gitignored dirs)
[ -d data4/map20x20_density_p1/10_Agent/train ] || {
  echo "data4 missing; run scripts/gen_round2_data.py data2 then" \
       "scripts/gen_finetune2_data.py data2" >&2; exit 1; }

TS=$(date +%s)
FLAGS=(configs/dcp_finetune2.json --mode train --data_augment
       --pretrained "$PRETRAINED" --log_time_trained "$TS")
echo "launching fine-tune leg 2 at ts=$TS from $PRETRAINED"
nohup python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > "/tmp/ft2_$TS.log" 2>&1 &
PID=$!
EXP="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/$TS"
echo "train pid=$PID exp=$EXP log=/tmp/ft2_$TS.log"

nohup scripts/train_watchdog.sh "$PID" "$EXP" 60 1500 -- \
  python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" --con_train \
  > "/tmp/ft2_watchdog_$TS.log" 2>&1 &
echo "watchdog pid=$!"
nohup scripts/post_train_r2b.sh "$PID" "$EXP" \
  > "/tmp/ft2_post_$TS.log" 2>&1 &
echo "post-train chain pid=$!"
