#!/bin/bash
# Tuned-commR generalization legs — reported SEPARATELY from the
# reference-protocol lines of eval_round2.sh. commR winners selected on
# the fresh seed-515151 valid2 pools (benchmarks/commR_sweep_leg1.json:
# 28x28/20 -> commR 7; 40x40/40 -> default 6, no tuned line needed).
# Tuning commR per regime is reference-faithful: the reference's own
# 64-agent test bumps commR to 11 (test_general_dcpOE_best_K3.sh).
# Usage: scripts/eval_gen_tuned.sh <checkpoint.msgpack> [extra flags]
set -e
CKPT="$1"; shift
COMMON=(--data_root data2 --save_root experiments_r2)

python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 28 --map_h 28 --num_agents 20 --num_testset 500 --commR 7 \
    "${COMMON[@]}" "$@"
# tuned commR + decentralized deadlock-break (both framework-native)
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 28 --map_h 28 --num_agents 20 --num_testset 500 --commR 7 \
    --deadlock_break 3 "${COMMON[@]}" "$@"
