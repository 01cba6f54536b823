#!/bin/bash
# Generalization evals (mirrors reference scripts/test_general_dcpOE_best_K3.sh):
# same net tested at 28x28/20 agents, 40x40/40 agents, 40x40/64 agents commR 11.
CKPT="$1"; shift
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 28 --map_h 28 --num_agents 20 --num_testset 500 "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 40 --num_testset 200 "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 20 "$@"
