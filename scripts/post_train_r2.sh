#!/bin/bash
# Round-2 post-training chain: wait for the training PID, then run the
# reference-regime eval sweep, the Pallas roofline harness, and bench on
# the (now free) real chip. Survives session death under nohup.
# Usage: scripts/post_train_r2.sh <train_pid> <exp_dir>
set -u
PID="$1"
EXP="$2"
cd /root/repo

while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "training pid $PID exited at $(date -u)"

CKPT="$EXP/checkpoints/model_best.msgpack"
if [ ! -f "$CKPT" ]; then
  # fall back to the best-tagged name used by the checkpointer
  CKPT=$(find "$EXP/checkpoints" -name '*best*.msgpack' | head -1)
fi
echo "using checkpoint: $CKPT"

echo "=== EVAL SWEEP ==="
timeout 7200 bash scripts/eval_round2.sh "$CKPT" 2>&1 | grep -v WARNING

echo "=== REAL-TPU KERNEL TESTS ==="
timeout 1800 python -m pytest tests/test_tpu_real.py -q -m tpu 2>&1 \
  | grep -v WARNING | tail -2
KERNELS_OK=${PIPESTATUS[0]}

echo "=== PALLAS ROOFLINE ==="
if [ "$KERNELS_OK" -eq 0 ]; then
  timeout 3600 python benchmarks/pallas_roofline.py 2>&1 | grep -v WARNING
else
  echo "skipped: kernel tests failed"
fi

echo "=== BENCH ==="
timeout 3600 python bench.py 2>&1 | grep -v WARNING | tail -1

echo "post-train chain done at $(date -u)"
