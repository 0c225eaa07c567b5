#!/usr/bin/env bash
# Smoke every solver preset for a couple of train steps (the analogue of the
# reference's bin/slurm_test_solver.sh, runnable locally or under any batch
# scheduler — submit this script per node/slice for job-level parallelism).
set -euo pipefail
# NOTE: at this 2-train-step / 8-SDE-step budget the dis+lerp preset's eval
# legitimately diverges (huge elbo) — the smoke checks the code path runs,
# not sample quality. TPU and CPU produce identical values to f32 precision.
cd "$(dirname "$0")/.."
for solver in pis dds dis cmcd vp_rds pbm_rds; do
  extra=""
  case "$solver" in
    pis|dds) extra="--model score" ;;
    dis)     extra="--model lerp" ;;
    vp_rds)  extra="--integrator ei --time-type snr" ;;
    pbm_rds) extra="--integrator ei --time-type snr" ;;
  esac
  echo "== $solver"
  python scripts/main.py --solver "$solver" --target two_modes --dim 2 \
      --train-steps 2 --train-batch-size 32 --eval-batch-size 64 \
      --eval-interval 2 --steps 8 $extra \
      --out-dir "logs/smoke/$solver" "$@"
done
