#!/usr/bin/env bash
# Smoke every target with the default DIS solver for a couple of steps
# (analogue of the reference's bin/slurm_test_target.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
for target in two_modes bracket_two_modes many_modes rings checkerboard \
              phi_four ionosphere; do
  echo "== $target"
  python scripts/main.py --solver dis --model lerp --target "$target" \
      --train-steps 2 --train-batch-size 32 --eval-batch-size 64 \
      --eval-interval 2 --steps 8 \
      --out-dir "logs/smoke_target/$target" "$@"
done
