#!/bin/bash
# Round-2 post-training chain v2: wait for the training PID, select the
# best checkpoint on the fresh valid2 pool (unbiased: test split untouched),
# then run the reference-regime eval sweep on the winner, the real-TPU
# kernel tests, and bench. Survives session death under nohup.
# Usage: scripts/post_train_r2b.sh <train_pid> <exp_dir>
set -u
PID="$1"
EXP="$2"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "training pid $PID exited at $(date -u)"

echo "=== CHECKPOINT SELECTION (valid2) ==="
# --ensemble-extra: also score ensemble(winner, leg-1 ep40) on the pool —
# round 2 showed ensembling between near-equals gains ~+1pp.
ENSEXTRA="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/1787138167/checkpoints/checkpoint_epoch40.msgpack"
timeout 3600 python scripts/select_checkpoint.py "$EXP" \
  --pool data2/map20x20_density_p1/10_Agent/valid2 --limit 600 \
  --last 12 --swa 4 8 \
  ${ENSEXTRA:+--ensemble-extra "$ENSEXTRA"} 2>&1 | grep -v WARNING

CKPT="$EXP/checkpoints/model_selected.msgpack"
[ -f "$CKPT" ] || CKPT="$EXP/checkpoints/model_best.msgpack"
echo "using checkpoint: $CKPT"

echo "=== EVAL SWEEP ==="
timeout 7200 bash scripts/eval_round2.sh "$CKPT" 2>&1 | grep -v WARNING

echo "=== TUNED-COMMR GEN LEGS ==="
timeout 3600 bash scripts/eval_gen_tuned.sh "$CKPT" 2>&1 | grep -v WARNING

echo "=== TEST ARCHIVE + FIGURES ==="
timeout 600 python -m gnn_pathplanning_tpu.stats.archive experiments_r2 \
  -o artifacts/test_archive_r3 --label dcpOE-K3-r3 2>&1 | grep -v WARNING
timeout 600 python scripts/make_round2_figures.py \
  artifacts/test_archive_r3.json 2>&1 | grep -v WARNING | tail -3

echo "=== REAL-TPU KERNEL TESTS ==="
timeout 1800 python -m pytest tests/test_tpu_real.py -q -m tpu 2>&1 \
  | grep -v WARNING | tail -2

echo "=== BENCH ==="
timeout 3600 python bench.py 2>&1 | grep -v WARNING | tail -1

echo "post-train chain v2 done at $(date -u)"
