#!/bin/bash
# Round-4 live-TPU artifact queue. Run from the repo root:
#   bash scripts/tpu_queue_r4.sh [stage ...]
# Stages (default: all, in this order):
#   bench    — bench.py recapture (fused-kernel headline + Pallas microbench)
#   mnist10  — MNIST 10-digit MixtureNice at the paper protocol (EBM 'nn' ref)
#   compete  — TwoModes d=16 competing table (PIS/DDS/DIS/CMCD/SMC/RE)
#   mnist01  — MNIST zero_one at the paper protocol
#   checker  — checkerboard filtered-metrics protocol row
# Each stage logs to docs/queue_r4/<stage>.{log,rc}; artifacts are committed
# ONLY when the stage exits 0 (failed stages keep their logs uncommitted for
# inspection — commit them by hand with an explicit failure tag if the
# failure itself is the result).
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/queue_r4

run_stage() {
  local name="$1"; shift
  local budget="$1"; shift
  echo "=== stage $name (budget ${budget}s): $*" | tee -a docs/queue_r4/queue.log
  local t0=$SECONDS
  timeout "$budget" "$@" >"docs/queue_r4/$name.log" 2>&1
  local rc=$?
  echo "$rc" >"docs/queue_r4/$name.rc"
  echo "=== stage $name done rc=$rc in $((SECONDS - t0))s" | tee -a docs/queue_r4/queue.log
  if [ "$rc" -eq 0 ]; then
    git add -A docs/queue_r4 experiments/results experiments/results_mnist \
      experiments/results_two_modes 2>/dev/null
    git commit -q -m "TPU queue r4: $name artifacts" || true
  fi
  return $rc
}

stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(bench mnist10 compete mnist01 checker)

for s in "${stages[@]}"; do
  case "$s" in
    bench)
      run_stage bench 3600 python bench.py ;;
    mnist10)
      run_stage mnist10 16200 python experiments/sample_mnist_unet.py \
        --ref_type nn --target_type mnist --results_path experiments/results_mnist ;;
    compete)
      ok=0
      for solver in pis_orig dds_orig dis_orig cmcd smc re; do
        run_stage "compete_$solver" 3600 python experiments/sample_two_modes_competing.py \
          --solver_type "$solver" --dim_range 16 \
          --results_path experiments/results_two_modes || ok=$?
      done
      run_stage compete_lrds 3600 python experiments/two_modes_mcmc_gmm.py \
        --dim_range 16 --results_path experiments/results_two_modes || ok=$?
      ;;
    mnist01)
      run_stage mnist01 10800 python experiments/sample_mnist_unet.py \
        --ref_type nn --target_type mnist_zero_one \
        --results_path experiments/results_mnist ;;
    checker)
      run_stage checker 3600 python experiments/sample_toy_ebm_mcmc.py \
        --target_type checkerboard --results_path experiments/results ;;
    *) echo "unknown stage $s" ;;
  esac
done
