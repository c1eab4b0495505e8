#!/bin/bash
# MFP-stage-only seed sweep (VERDICT round-4 item 7): the recurring seed-42
# delta (-0.0032/-0.0033/-0.0035 across rounds 2-4, always negative) needs
# disambiguating from a small systematic in the corruption/NCE stream. Run
# JUST the mfp stage (reference + map_tpu CPU backend) at 4 extra seeds so
# the mfp-stage CI roughly halves (n: 4 -> 8).
#
# Usage: nohup setsid nice -n 10 bash validation/run_mfp_seed_sweep.sh \
#          > validation/mfp_seed_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")"

SEEDS="${SEEDS:-46 47 48 49}"

for s in $SEEDS; do
  echo "=== seed $s: torch reference (mfp) $(date) ==="
  if [ ! -f "runs/reference_s$s/mfp/results.log" ]; then
    SEED=$s bash run_reference.sh mfp || echo "!!! reference mfp seed $s FAILED"
  fi
  echo "=== seed $s: map_tpu CPU backend (mfp) $(date) ==="
  if [ ! -f "runs/tpu_cpu_s$s/mfp/results.log" ]; then
    SEED=$s TAG=cpu EXTRA="--mock_devices=1" bash run_tpu.sh mfp \
      || echo "!!! map_tpu mfp seed $s FAILED"
  fi
done
echo "=== mfp sweep done $(date) ==="
