#!/bin/bash
# Round-5 evaluation sweep: the reference official protocol
# (scripts/test_general_dcpOE_best_K3.sh — in-dist 4440, 28x28/20 500,
# 40x40/40 200, 40x40/64 commR 11 x 20 on maze AND random maps) PLUS the
# statistically meaningful 200-case 64-agent pools (test_big splits; the
# official 20-case pools are their exact prefix — scripts/gen_eval_pools.py).
# Every line now carries a 95% Wilson CI on rate_ReachGoal.
# Usage: scripts/eval_round5.sh <checkpoint.msgpack> [extra flags]
set -e
CKPT="$1"; shift
COMMON=(--data_root data2 --save_root experiments_r2)

# Canary (see eval_round2.sh): catch a bad chip session before the sweep.
canary() {
  python -m gnn_pathplanning_tpu.cli.main configs/dcp_onlineExpert.json \
      --mode test --test_checkpoint "$CKPT" --num_testset 40 \
      "${COMMON[@]}" 2>/dev/null \
    | tail -1 \
    | python -c "import sys,ast; d=ast.literal_eval(sys.stdin.read()); sys.exit(0 if d['rate_ReachGoal'] > 0.5 else 1)"
}
if ! canary; then
  echo "canary eval failed (rate_ReachGoal <= 0.5) — retrying in 60 s" >&2
  sleep 60
  canary || { echo "canary failed twice: chip session is bad" >&2; exit 3; }
fi

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
# Official 20-case 64-agent lines, both map families.
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 20 \
    "${COMMON[@]}" "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 20 \
    --map_type random "${COMMON[@]}" "$@"
# Statistically meaningful 200-case pools (same protocol; official pools
# are the first-20 prefix).
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 200 \
    --test_split test_big "${COMMON[@]}" "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 200 \
    --test_split test_big --map_type random "${COMMON[@]}" "$@"

# Framework-native opt-in: decentralized deadlock-break (k=3, chosen on
# valid2). Reported SEPARATELY from the reference-semantics lines above.
if [ "${EVAL_DLB:-0}" = "1" ]; then
python -m gnn_pathplanning_tpu.cli.main configs/dcp_onlineExpert.json \
    --mode test --test_checkpoint "$CKPT" --num_testset 4440 \
    --deadlock_break 3 "${COMMON[@]}" "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 28 --map_h 28 --num_agents 20 --num_testset 500 \
    --deadlock_break 3 "${COMMON[@]}" "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 40 --num_testset 200 \
    --deadlock_break 3 "${COMMON[@]}" "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 200 \
    --test_split test_big --deadlock_break 3 "${COMMON[@]}" "$@"
python -m gnn_pathplanning_tpu.cli.main --mode test --test_checkpoint "$CKPT" \
    --map_w 40 --map_h 40 --num_agents 64 --commR 11 --num_testset 200 \
    --test_split test_big --map_type random --deadlock_break 3 \
    "${COMMON[@]}" "$@"
fi
