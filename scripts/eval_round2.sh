#!/bin/bash
# Round-2 reference-scale evaluation sweep (mirrors the reference's test
# regime: configs/dcp_ECBS.json num_testset=4500 + scripts/
# test_general_dcpOE_best_K3.sh generalization set).
# Usage: scripts/eval_round2.sh <checkpoint.msgpack> [extra flags]
set -e
CKPT="$1"; shift
COMMON=(--data_root data2 --save_root experiments_r2)

# In-distribution: full 20x20/10ag test split (4440 generated cases).
python -m gnn_pathplanning_tpu.cli.main configs/dcp_onlineExpert.json \
    --mode test --test_checkpoint "$CKPT" --num_testset 4440 \
    "${COMMON[@]}" "$@"

# Generalization (reference test_general_dcpOE_best_K3.sh).
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 28 --map_h 28 --num_agents 20 --num_testset 500 \
    "${COMMON[@]}" "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 40 --num_testset 200 \
    "${COMMON[@]}" "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 20 \
    "${COMMON[@]}" "$@"
