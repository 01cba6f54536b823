#!/bin/bash
# Round-3 on-chip sweep, part B (after the timing-methodology fixes):
#   1. scaling_edges d=1 anchors (methodology was already sound)
#   2. swarm_stress under jit (2048 all paths; 8192 geometric/compact/halo;
#      8192 compact/halo with MXU weights)
#   3. kernel_anatomy with the two-chain-length slope (dispatch floor
#      cancelled)
# The persistent compile cache is shared across the legs' processes.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== SCALING EDGES d=1 anchors === $(date -u)"
timeout 1800 python benchmarks/scaling_edges.py --platform tpu --devices 1 \
  --n-per-device 16384 \
  --out benchmarks/scaling_edges_tpu_r3_dense.json 2>&1 | grep -v WARNING | tail -2
timeout 1800 python benchmarks/scaling_edges.py --platform tpu --devices 1 \
  --n-per-device 16384 --geometric --cap 16 \
  --out benchmarks/scaling_edges_tpu_r3_geo.json 2>&1 | grep -v WARNING | tail -2
timeout 1800 python benchmarks/scaling_edges.py --platform tpu --devices 1 \
  --n-per-device 16384 --halo \
  --out benchmarks/scaling_edges_tpu_r3_halo.json 2>&1 | grep -v WARNING | tail -2
echo "=== SWARM STRESS n=2048 (jit) === $(date -u)"
timeout 3600 python benchmarks/swarm_stress.py --agents 2048 --steps 16 \
  --out benchmarks/swarm_stress_r3_n2048.json 2>&1 | grep -v WARNING | tail -6
echo "=== SWARM STRESS n=8192 (jit) === $(date -u)"
timeout 3600 python benchmarks/swarm_stress.py --agents 8192 --steps 8 \
  --paths geometric compact halo \
  --out benchmarks/swarm_stress_r3_n8192.json 2>&1 | grep -v WARNING | tail -5
echo "=== SWARM STRESS n=8192 mxu-weights (jit) === $(date -u)"
timeout 3600 python benchmarks/swarm_stress.py --agents 8192 --steps 8 \
  --paths compact halo --mxu-weights \
  --out benchmarks/swarm_stress_r3_n8192_mxuw.json 2>&1 | grep -v WARNING | tail -4
echo "=== KERNEL ANATOMY (slope) === $(date -u)"
timeout 3600 python benchmarks/kernel_anatomy.py --agents 4096 16384 \
  --out benchmarks/kernel_anatomy_r3.json 2>&1 | grep -v WARNING | tail -3
echo "round3 benches part B done at $(date -u)"
