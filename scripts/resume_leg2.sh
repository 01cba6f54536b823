#!/bin/bash
# Resume fine-tune leg 2 (run 1787222028, died at epoch 3/60 when the
# container recycled ~10 min after launch) after regenerating data4 (all
# generation is seeded, so the rebuilt dataset is identical and
# --con_train from the epoch-3 checkpoint is sound; the run died before
# its first validation, so no failure cache is lost).
#
# Optionally waits for a PID (the round-3 bench sweep) so training never
# contends with on-chip measurements, then waits for the TPU tunnel,
# freshens the heartbeat mtime, and launches trainer + watchdog +
# post-train chain with the run's ORIGINAL flags plus --con_train.
# Usage: scripts/resume_leg2.sh [wait_pid]
set -eu
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

TS=1787222028
EXP="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/$TS"
LEG1="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/1787138167"
FLAGS=(configs/dcp_finetune2.json --mode train --data_augment
       --pretrained "$LEG1/checkpoints/model_selected.msgpack"
       --log_time_trained "$TS" --con_train)

WAITPID="${1:-0}"
if [ "$WAITPID" != "0" ]; then
  echo "[resume_leg2 $(date -u +%H:%M:%S)] waiting for pid $WAITPID (benches)"
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 30; done
fi

[ -d data4/map20x20_density_p1/10_Agent/train ] || {
  echo "data4 missing; run scripts/gen_round2_data.py data2 then" \
       "scripts/gen_finetune2_data.py data2" >&2; exit 1; }

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

echo "[resume_leg2 $(date -u +%H:%M:%S)] waiting for TPU tunnel"
until probe; do
  echo "[resume_leg2 $(date -u +%H:%M:%S)] tunnel down; retry in 120 s"
  sleep 120
done
echo "[resume_leg2 $(date -u +%H:%M:%S)] tunnel healthy"

if pgrep -f "cli.main.*--log_time_trained $TS" >/dev/null 2>&1; then
  echo "[resume_leg2] a trainer for $TS is already running; bailing" >&2
  exit 1
fi
if pgrep -f "train_watchdog.sh.*$TS" >/dev/null 2>&1; then
  echo "[resume_leg2] a watchdog for $TS is already running; bailing" >&2
  exit 1
fi

touch "$EXP/metrics.jsonl"
nohup python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > /tmp/ft2_resume.log 2>&1 &
PID=$!
echo "[resume_leg2] trainer pid=$PID log=/tmp/ft2_resume.log"
# FINAL_EPOCH = max_epoch (60): the trainer's epoch range is inclusive.
nohup scripts/train_watchdog.sh "$PID" "$EXP" 60 1500 -- \
  python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > /tmp/ft2_resume_watchdog.log 2>&1 &
echo "[resume_leg2] watchdog pid=$!"
nohup scripts/post_train_r2b.sh "$PID" "$EXP" \
  > /tmp/ft2_resume_post.log 2>&1 &
echo "[resume_leg2] post-train chain pid=$!"
