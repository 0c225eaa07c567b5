#!/bin/bash
# Round-4 competing-table queue (VERDICT r3 item #6).
# Runs each baseline solver on TwoModes d=16 and ManyModes at reference scales
# (sample_two_modes_competing.py defaults: train_steps 4096, batch 1024,
# eval 8192, K=100; SMC/RE 128 levels x 1024 particles x 32 MCMC steps),
# plus the LRDS row at the matched 4096-step budget.
# Sequential on purpose: one TPU chip. Each cell appends to its own pickle;
# nothing here touches git — results are committed manually after inspection.
set -u
cd "$(dirname "$0")/../experiments"
LOG=/tmp/competing_queue.log
: > "$LOG"
FAIL=0
note() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
check() { local rc=$1; shift; note "$* rc=$rc"; [ "$rc" -ne 0 ] && FAIL=1; }

note "=== TwoModes d=16 ==="
for S in pis_orig dis_orig cmcd dds_orig smc re; do
  note "two_modes $S start"
  timeout 1500 python sample_two_modes_competing.py --solver_type "$S" \
    --dim_range 16 >> "$LOG" 2>&1
  check $? "two_modes $S"
done

note "=== TwoModes d=16 LRDS (fitted-GMM ref, matched budget) ==="
timeout 1500 python two_modes_mcmc_gmm.py --ref_type gmm --dim_range 16 \
  >> "$LOG" 2>&1
check $? "two_modes lrds"

note "=== ManyModes dim 8 ==="
for S in pis_orig dis_orig cmcd dds_orig smc re; do
  note "many_modes $S start"
  timeout 2400 python sample_many_modes_competing.py --solver_type "$S" \
    --n_modes_range "${MM_MODES:-4,16,64}" >> "$LOG" 2>&1
  check $? "many_modes $S"
done

note "=== ManyModes LRDS (fitted-GMM ref, matched budget) ==="
timeout 2400 python many_modes_mcmc_gmm.py --n_modes_range "${MM_MODES:-4,16,64}" \
  >> "$LOG" 2>&1
check $? "many_modes lrds"

# regenerate the results summary in the same session that produced the
# pickles — a queue run can no longer land bare artifacts (VERDICT r4 #8)
python summarize_results.py >> "$LOG" 2>&1
check $? "summarize"
note "queue done (FAIL=$FAIL)"
exit "$FAIL"
