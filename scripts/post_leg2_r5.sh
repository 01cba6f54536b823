#!/bin/bash
# Leg-2 post chain: wait for training, 5-pool gen-aware selection (leg-1
# winner as the ensemble-extra floor), then the reference-semantics
# official rows + 200-case 64-agent pools for the winner.
# Usage: scripts/post_leg2_r5.sh <train_pid> <exp_dir>
set -u
PID="$1"; EXP="$2"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
TS=$(basename "$EXP")
while pgrep -f "log_time_trained $TS" >/dev/null 2>&1; do sleep 20; done
echo "leg-2 training exited at $(date -u)"

LEG1="experiments_r2/dcp_map20x20_rho1_10Agent/K3_HS0/1787328263/checkpoints/model_selected.msgpack"
timeout 7200 python scripts/select_checkpoint.py "$EXP" \
  --pool data2/map20x20_density_p1/10_Agent/valid2 --limit 600 \
  --last 6 --swa 4 \
  --gen-pools data2/map28x28_density_p1/20_Agent/valid2:360 \
              data2/map40x40_density_p1/40_Agent/valid2:290 \
              data2/map40x40_density_p1/64_Agent/valid2:40 \
              data2/random40x40_density_p1/64_Agent/valid2:40 \
  --gen-top 4 \
  --ensemble-extra "$LEG1" 2>&1 | grep -v WARNING

CKPT="$EXP/checkpoints/model_selected.msgpack"
[ -f "$CKPT" ] || CKPT="$EXP/checkpoints/model_best.msgpack"
echo "using checkpoint: $CKPT"

COMMON=(--data_root data2 --save_root experiments_r2)
python -m gnn_pathplanning_tpu.cli.main configs/dcp_onlineExpert.json \
    --mode test --test_checkpoint "$CKPT" --num_testset 4440 \
    "${COMMON[@]}" 2>&1 | grep -v WARNING | tail -1
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 28 --map_h 28 --num_agents 20 --num_testset 500 \
    "${COMMON[@]}" 2>&1 | grep -v WARNING | tail -1
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 40 --num_testset 200 \
    "${COMMON[@]}" 2>&1 | grep -v WARNING | tail -1
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 200 \
    --test_split test_big "${COMMON[@]}" 2>&1 | grep -v WARNING | tail -1
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 200 \
    --test_split test_big --map_type random "${COMMON[@]}" \
    2>&1 | grep -v WARNING | tail -1
echo "leg-2 eval done at $(date -u)"
