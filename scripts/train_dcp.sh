#!/bin/bash
# Train recipes for K in {1,2,3} (mirrors reference scripts/train_dcp_DMap.sh)
for K in 1 2 3; do
  python -m gnn_pathplanning_tpu.cli.main configs/dcp_ECBS.json \
      --mode train --nGraphFilterTaps "$K" "$@"
done
