#!/bin/bash
# Round-4 on-chip benchmark sweep (run on an idle chip, after training):
# 1. kernel anatomy A/B: receiver-hoisted + pipelined vs legacy orientation
# 2. roofline_r4: % of HBM roofline for the new compact kernel
# 3. crossover: dense vs geometric vs compact FULL-filter table (monotone,
#    nothing hoisted) incl. N=32768 where dense cannot exist
# 4. swarm stress at N=32768 and 65536 (compact + halo; dense recorded as
#    impossible/OOM)
# Usage: scripts/round4_benches.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== KERNEL ANATOMY r4 ==="
timeout 3600 python benchmarks/kernel_anatomy.py --agents 16384 \
  --out benchmarks/kernel_anatomy_r4.json 2>&1 | grep -v WARNING

echo "=== ROOFLINE r4 ==="
timeout 3600 python benchmarks/pallas_roofline.py \
  --sizes 1024 4096 16384 \
  --out benchmarks/roofline_r4.json 2>&1 | grep -v WARNING | tail -3

echo "=== CROSSOVER TABLE ==="
timeout 5400 python benchmarks/crossover.py \
  --sizes 1024 2048 4096 8192 16384 32768 \
  --out benchmarks/crossover_r4.json 2>&1 | grep -v WARNING | tail -3

echo "=== SWARM STRESS N=32768 ==="
timeout 3600 python benchmarks/swarm_stress.py --agents 32768 --steps 8 \
  --paths dense compact halo \
  --out benchmarks/swarm_stress_r4_n32768.json 2>&1 | grep -v WARNING | tail -5

echo "=== SWARM STRESS N=65536 ==="
timeout 5400 python benchmarks/swarm_stress.py --agents 65536 --steps 8 \
  --paths compact halo \
  --out benchmarks/swarm_stress_r4_n65536.json 2>&1 | grep -v WARNING | tail -4

echo "=== ROLLOUT BATCH-SCALING PROBE ==="
timeout 3600 python benchmarks/rollout_scaling.py 2>&1 | grep -v WARNING | tail -6

echo "=== REAL-TPU KERNEL TESTS ==="
timeout 1800 python -m pytest tests/test_tpu_real.py -q -m tpu 2>&1 \
  | grep -v WARNING | tail -2

echo "round-4 bench sweep done at $(date -u)"
