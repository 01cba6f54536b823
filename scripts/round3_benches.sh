#!/bin/bash
# Round-3 on-chip benchmark sweep. Waits for a PID (the post-train chain)
# so measurements never contend with training/eval, then runs:
#   1. kernel_anatomy (stage-isolated per-grid-step breakdown, N=4k/16k)
#   2. pallas_roofline (exhaustive vs compact vs multi-sender vs MXU-weight
#      grids + bf16, HBM roofline %)
#   3. swarm_stress at N=2048 (all paths) and N=8192 (compact/halo,
#      +--mxu-weights variant) with shield-round stats
#   4. scaling_edges --platform tpu d=1 absolute edges/s anchors
#      (dense / geometric-compact / halo)
# Usage: scripts/round3_benches.sh [wait_pid]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PID="${1:-0}"
if [ "$PID" != "0" ]; then
  echo "waiting for pid $PID (post-train chain)"
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
echo "=== KERNEL ANATOMY === $(date -u)"
timeout 3600 python benchmarks/kernel_anatomy.py --agents 4096 16384 \
  --out benchmarks/kernel_anatomy_r3.json 2>&1 | grep -v WARNING
echo "=== PALLAS ROOFLINE === $(date -u)"
timeout 5400 python benchmarks/pallas_roofline.py \
  --sizes 1024 4096 16384 --multi 2 4 \
  --out benchmarks/roofline_r3.json 2>&1 | grep -v WARNING | tail -20
echo "=== SWARM STRESS n=2048 === $(date -u)"
timeout 3600 python benchmarks/swarm_stress.py --agents 2048 --steps 16 \
  --out benchmarks/swarm_stress_r3_n2048.json 2>&1 | grep -v WARNING | tail -6
echo "=== SWARM STRESS n=8192 === $(date -u)"
timeout 3600 python benchmarks/swarm_stress.py --agents 8192 --steps 8 \
  --paths geometric compact halo \
  --out benchmarks/swarm_stress_r3_n8192.json 2>&1 | grep -v WARNING | tail -5
echo "=== SWARM STRESS n=8192 mxu-weights === $(date -u)"
timeout 3600 python benchmarks/swarm_stress.py --agents 8192 --steps 8 \
  --paths compact halo --mxu-weights \
  --out benchmarks/swarm_stress_r3_n8192_mxuw.json 2>&1 | grep -v WARNING | tail -4
echo "=== SCALING EDGES d=1 anchors === $(date -u)"
# swarm-scale N so the anchor reflects kernel throughput, not launch overhead
timeout 1800 python benchmarks/scaling_edges.py --platform tpu --devices 1 \
  --n-per-device 16384 \
  --out benchmarks/scaling_edges_tpu_r3_dense.json 2>&1 | grep -v WARNING | tail -2
timeout 1800 python benchmarks/scaling_edges.py --platform tpu --devices 1 \
  --n-per-device 16384 --geometric --cap 16 \
  --out benchmarks/scaling_edges_tpu_r3_geo.json 2>&1 | grep -v WARNING | tail -2
timeout 1800 python benchmarks/scaling_edges.py --platform tpu --devices 1 \
  --n-per-device 16384 --halo \
  --out benchmarks/scaling_edges_tpu_r3_halo.json 2>&1 | grep -v WARNING | tail -2
echo "round3 benches done at $(date -u)"
