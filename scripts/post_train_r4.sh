#!/bin/bash
# Round-4 post-training chain for the MIXED-distribution leg: wait for the
# training PID, select the best checkpoint on the COMBINED pools (20x20
# valid2 + the regenerated seed-515151 28x28/20 and 40x40/40 valid2 pools —
# the mixed leg's objective is generalization, so selection must see it),
# then run the reference-regime eval sweep on the winner and archive.
# Usage: scripts/post_train_r4.sh <train_pid> <exp_dir>
set -u
PID="$1"
EXP="$2"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "training pid $PID exited at $(date -u)"

echo "=== CHECKPOINT SELECTION (valid2 + gen pools) ==="
# --ensemble-extra: leg-1 ep40 scored standalone so the mixed leg cannot
# demote model_selected below the best known reference-recipe model.
ENSEXTRA="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/1787138167/checkpoints/checkpoint_epoch40.msgpack"
timeout 7200 python scripts/select_checkpoint.py "$EXP" \
  --pool data2/map20x20_density_p1/10_Agent/valid2 --limit 600 \
  --last 8 --swa 4 8 \
  --gen-pools data2/map28x28_density_p1/20_Agent/valid2:360 \
              data2/map40x40_density_p1/40_Agent/valid2:290 \
  --gen-top 4 \
  ${ENSEXTRA:+--ensemble-extra "$ENSEXTRA"} 2>&1 | grep -v WARNING

CKPT="$EXP/checkpoints/model_selected.msgpack"
[ -f "$CKPT" ] || CKPT="$EXP/checkpoints/model_best.msgpack"
echo "using checkpoint: $CKPT"

echo "=== EVAL SWEEP ==="
timeout 10800 bash scripts/eval_round2.sh "$CKPT" 2>&1 | grep -v WARNING

echo "=== TEST ARCHIVE ==="
timeout 600 python -m gnn_pathplanning_tpu.stats.archive experiments_r2 \
  -o artifacts/test_archive_r4 --label dcpOE-K3-r4 2>&1 | grep -v WARNING

echo "post-train chain r4 done at $(date -u)"
