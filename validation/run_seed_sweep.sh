#!/bin/bash
# Multi-seed AUC-parity sweep (VERDICT round-2 item 2): run the torch
# reference AND map_tpu (JAX CPU backend) at several seeds on the shared
# 400k-row artifacts, so the per-stage parity deltas can be compared against
# a MEASURED seed-noise band instead of a hand-waved "~1e-3 is noise".
#
# Seed 42 runs already exist (runs/reference, runs/tpu_cpu); this adds the
# rest. Serial on purpose: the box has 2 CPU cores.
#
# Usage: nohup setsid bash validation/run_seed_sweep.sh > validation/seed_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")"

SEEDS="${SEEDS:-43 44 45}"

for s in $SEEDS; do
  echo "=== seed $s: torch reference (all 5 stages) $(date) ==="
  if [ ! -f "runs/reference_s$s/finetune_rfd/results.log" ]; then
    SEED=$s bash run_reference.sh all || echo "!!! reference seed $s FAILED"
  fi
  echo "=== seed $s: map_tpu CPU backend (all 5 stages) $(date) ==="
  if [ ! -f "runs/tpu_cpu_s$s/finetune_rfd/results.log" ]; then
    SEED=$s TAG=cpu EXTRA="--mock_devices=1" bash run_tpu.sh all \
      || echo "!!! map_tpu seed $s FAILED"
  fi
done
echo "=== sweep done $(date) ==="
