#!/bin/bash
# Online-expert training (mirrors reference scripts/train_dcpOE_DMap.sh)
python -m gnn_pathplanning_tpu.cli.main configs/dcp_onlineExpert.json \
    --mode train --nGraphFilterTaps "${K:-3}" "$@"
