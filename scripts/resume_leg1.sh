#!/bin/bash
# Resume fine-tune leg 1 (run 1787138167) for its final epochs (54-60 of 60;
# the trainer runs epochs start..max_epoch INCLUSIVE)
# after a container recycle: waits for the TPU tunnel to answer a probe,
# freshens the metrics.jsonl heartbeat (git checkout resets mtime — a stale
# mtime once made the watchdog kill the fresh trainer), then launches the
# trainer with the run's ORIGINAL flags plus --con_train, under the
# watchdog. Flags live here (not in an interactive shell variable) so the
# watchdog's resume command can never silently lose them.
set -eu
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

EXP="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/1787138167"
FLAGS=(configs/dcp_finetune.json --mode train --data_augment
       --log_time_trained 1787138167 --con_train)

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

echo "[resume_leg1 $(date -u +%H:%M:%S)] waiting for TPU tunnel"
until probe; do
  echo "[resume_leg1 $(date -u +%H:%M:%S)] tunnel down; retry in 120 s"
  sleep 120
done
echo "[resume_leg1 $(date -u +%H:%M:%S)] tunnel healthy"

# Guard against double invocation (e.g. a second recycle while the first
# instance's trainer is alive): a duplicate trainer+watchdog pair against the
# same exp dir corrupts checkpoints and confuses the watchdog's pgrep.
if pgrep -f "cli.main.*--log_time_trained 1787138167" >/dev/null 2>&1; then
  echo "[resume_leg1] a trainer for 1787138167 is already running; bailing" >&2
  exit 1
fi
if pgrep -f "train_watchdog.sh.*1787138167" >/dev/null 2>&1; then
  echo "[resume_leg1] a watchdog for 1787138167 is already running; bailing" >&2
  exit 1
fi

touch "$EXP/metrics.jsonl"
nohup python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > /tmp/ft1_resume.log 2>&1 &
PID=$!
echo "[resume_leg1] trainer pid=$PID log=/tmp/ft1_resume.log"
# FINAL_EPOCH = max_epoch (60): the trainer's range is inclusive, so the
# watchdog must protect epoch 60's validation/checkpoint too.
nohup scripts/train_watchdog.sh "$PID" "$EXP" 60 1500 -- \
  python -m gnn_pathplanning_tpu.cli.main "${FLAGS[@]}" \
  > /tmp/ft1_watchdog.log 2>&1 &
echo "[resume_leg1] watchdog pid=$!"
