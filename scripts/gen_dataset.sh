#!/bin/bash
# Dataset generation recipe: 20x20 maps, 10 agents, ECBS expert
# (mirrors the reference offlineExpert/run_CasesSolver.sh + run_DataTrans.sh flow)
python -m gnn_pathplanning_tpu.cli.main --mode gen_data \
    --map_w 20 --map_h 20 --num_agents 10 \
    --num_maps "${NUM_MAPS:-100}" --cases_per_map "${CASES_PER_MAP:-30}" \
    --solver ecbs --workers "${WORKERS:-8}"
