#!/bin/bash
# Round-5 post-training chain: wait for the training PID, re-measure the
# torch CPU baseline on the now-idle host (ADVICE r4: restore >= 6 reps),
# select the checkpoint on the COMBINED pools (in-dist valid2 + all four
# generalization valid2 pools incl. the 64-agent ones — the round-5
# objective is the generalization targets), then run the official +
# big-pool eval sweep (with deadlock-break rows) and archive.
# Usage: scripts/post_train_r5.sh <train_pid> <exp_dir>
set -u
PID="$1"
EXP="$2"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$PID" 2>/dev/null; do sleep 30; done
# The watchdog may have relaunched training under a NEW pid — keep waiting
# while any live process carries this experiment's timestamp (wait-only;
# never used for killing).
TS=$(basename "$EXP")
while pgrep -f "log_time_trained $TS" >/dev/null 2>&1; do sleep 30; done
echo "training for ts=$TS exited at $(date -u)"

echo "=== BASELINE RE-MEASURE (idle host, best-of-6) ==="
sleep 420  # let the 5-min load average decay below the 1.0 idle gate
BASELINE_RUNS=6 timeout 1800 python benchmarks/torch_baseline.py \
  2>&1 | tail -2 || echo "baseline re-measure failed; committed record kept"

echo "=== CHECKPOINT SELECTION (valid2 + 4 gen pools) ==="
# --ensemble-extra: the r4 flagship scored standalone so this leg cannot
# demote model_selected below the best known model.
ENSEXTRA="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/1787296204/checkpoints/model_selected.msgpack"
timeout 10800 python scripts/select_checkpoint.py "$EXP" \
  --pool data2/map20x20_density_p1/10_Agent/valid2 --limit 600 \
  --last 8 --swa 4 8 \
  --gen-pools data2/map28x28_density_p1/20_Agent/valid2:360 \
              data2/map40x40_density_p1/40_Agent/valid2:290 \
              data2/map40x40_density_p1/64_Agent/valid2:40 \
              data2/random40x40_density_p1/64_Agent/valid2:40 \
  --gen-top 5 \
  ${ENSEXTRA:+--ensemble-extra "$ENSEXTRA"} 2>&1 | grep -v WARNING

CKPT="$EXP/checkpoints/model_selected.msgpack"
[ -f "$CKPT" ] || CKPT="$EXP/checkpoints/model_best.msgpack"
echo "using checkpoint: $CKPT"

echo "=== EVAL SWEEP (official + test_big + dlb rows) ==="
EVAL_DLB=1 timeout 14400 bash scripts/eval_round5.sh "$CKPT" \
  2>&1 | grep -v WARNING

echo "=== TEST ARCHIVE ==="
timeout 600 python -m gnn_pathplanning_tpu.stats.archive experiments_r2 \
  -o artifacts/test_archive_r5 --label dcpOE-K3-r5 2>&1 | grep -v WARNING

echo "post-train chain r5 done at $(date -u)"
