#!/bin/bash
# Round-4 OE-heavy fine-tune (docs/stall_analysis_r4.md): short cosine
# fine-tune with the Online Expert harvesting every 2 epochs — the
# diagnosis showed 54% of in-dist failures are absorbing "stop next to a
# parked agent" states, exactly what DAgger-style failure harvesting
# injects supervision for. Seeded from the best available checkpoint.
# Usage: scripts/round4_oeheavy.sh <pretrained.msgpack>
set -eu
PRETRAINED="$1"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
[ -f "$PRETRAINED" ] || { echo "missing pretrained: $PRETRAINED" >&2; exit 1; }

TS=$(date +%s)
FLAGS=(configs/dcp_oeheavy.json --mode train --data_augment
       --pretrained "$PRETRAINED" --log_time_trained "$TS")
echo "launching OE-heavy leg at ts=$TS from $PRETRAINED"
nohup python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > "/tmp/oeheavy_$TS.log" 2>&1 &
PID=$!
EXP="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/$TS"
echo "train pid=$PID exp=$EXP log=/tmp/oeheavy_$TS.log"
nohup scripts/train_watchdog.sh "$PID" "$EXP" 24 1500 -- \
  python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" --con_train \
  > "/tmp/oeheavy_watchdog_$TS.log" 2>&1 &
echo "watchdog pid=$!"
