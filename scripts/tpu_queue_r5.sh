#!/bin/bash
# Round-5 live-TPU artifact queue. Run from the repo root:
#   bash scripts/tpu_queue_r5.sh [stage ...]
# Stages (default order):
#   compete_fix — re-run the competing rows that round 4 got wrong:
#                 RE rows (SMC/RE slot-count fix), TwoModes DIS (vp_10,
#                 protocol parity), TwoModes CMCD (clip_score wiring)
#   checker     — checkerboard filtered-metrics row (-inf off-board fix)
#   mnist01     — MNIST zero_one at the paper 'nn' protocol, real EBM budget
#   micro       — profile_fused + sinkhorn_bench attribution tables
#   bench       — fresh bench.py capture
# Each stage logs to docs/queue_r5/<stage>.{log,rc}; artifacts are committed
# only when the stage exits 0, and the results summary is regenerated in the
# same commit (VERDICT r4 #8).
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/queue_r5

run_stage() {
  local name="$1"; shift
  local budget="$1"; shift
  echo "=== stage $name (budget ${budget}s): $*" | tee -a docs/queue_r5/queue.log
  local t0=$SECONDS
  timeout "$budget" "$@" >"docs/queue_r5/$name.log" 2>&1
  local rc=$?
  echo "$rc" >"docs/queue_r5/$name.rc"
  echo "=== stage $name done rc=$rc in $((SECONDS - t0))s" | tee -a docs/queue_r5/queue.log
  if [ "$rc" -eq 0 ]; then
    python experiments/summarize_results.py >>docs/queue_r5/queue.log 2>&1
    git add -A docs/queue_r5 experiments/results experiments/results_mnist 2>/dev/null
    git commit -q -m "TPU queue r5: $name artifacts" || true
  fi
  return $rc
}

stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(micro compete_core mnist01 checker compete_more bench)

for s in "${stages[@]}"; do
  case "$s" in
    compete_core)
      # the three rows round 4 got wrong (CMCD clip_score, DIS protocol
      # parity) or never ran (RE) — highest table value per TPU-minute
      run_stage compete_cmcd2m 2400 python experiments/sample_two_modes_competing.py \
        --solver_type cmcd --dim_range 16 --results_path experiments/results
      run_stage compete_dis2m 2400 python experiments/sample_two_modes_competing.py \
        --solver_type dis_orig --dim_range 16 --results_path experiments/results
      run_stage compete_re2m 2400 python experiments/sample_two_modes_competing.py \
        --solver_type re --dim_range 16 --results_path experiments/results
      ;;
    re2m)
      # standalone RE row re-run (warmup-scan OOM fix, mcmc/smc.py)
      run_stage compete_re2m 2400 python experiments/sample_two_modes_competing.py \
        --solver_type re --dim_range 16 --results_path experiments/results
      ;;
    compete_more)
      run_stage compete_smc2m 2400 python experiments/sample_two_modes_competing.py \
        --solver_type smc --dim_range 16 --results_path experiments/results
      run_stage compete_remm 3600 python experiments/sample_many_modes_competing.py \
        --solver_type re --n_modes_range 4,16,64 --results_path experiments/results
      run_stage compete_smcmm 3600 python experiments/sample_many_modes_competing.py \
        --solver_type smc --n_modes_range 4,16,64 --results_path experiments/results
      ;;
    checker)
      run_stage checker 3600 python experiments/sample_toy_ebm_mcmc.py \
        --target_type checkerboard --results_path experiments/results ;;
    mnist01)
      # EBM curve first (fwd-ESS vs epoch trace, saves selected params),
      # then the sampler run reuses the checkpoint (key-identical split)
      run_stage mnist_curve 8400 python experiments/mnist_ebm_curve.py \
        --target_type mnist_zero_one --ebm_epochs 300 \
        --results_path experiments/results_mnist
      run_stage mnist01 7200 python experiments/sample_mnist_unet.py \
        --ref_type nn --target_type mnist_zero_one --ebm_epochs 300 \
        --ebm_params_from experiments/results_mnist/ebm_params_mnist_zero_one_seed_0.msgpack \
        --results_path experiments/results_mnist ;;
    micro)
      run_stage profile_fused 2400 python scripts/profile_fused.py
      run_stage sinkhorn 2400 python scripts/sinkhorn_bench.py --tile_sweep
      ;;
    profile)
      # profile-only re-run (pipelined-dispatch timing fix)
      run_stage profile_fused 2400 python scripts/profile_fused.py ;;
    bench)
      run_stage bench 3600 python bench.py ;;
    *) echo "unknown stage $s" ;;
  esac
done
