#!/bin/bash
# TPU tunnel watcher + queued run sequence (single owner of the chip).
# Probes until the axon backend answers, then runs, in order:
#   1. bench.py                      -> fresh round-3 perf artifact
#   2. MNIST MixtureNice zero_one    -> the round's converged-run deliverable
# Each stage logs to /tmp/tpu_watch.log; stage outputs under /tmp.
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; assert len(jax.devices()) > 0" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP" >> /tmp/tpu_watch.log
    touch /tmp/tpu_up.flag
    break
  fi
  echo "$(date -u +%FT%TZ) tunnel down" >> /tmp/tpu_watch.log
  sleep 120
done

BENCH_PROBE_WINDOW_S=120 timeout 2400 python bench.py \
  > /tmp/bench_r3.out 2> /tmp/bench_r3.err
echo "$(date -u +%FT%TZ) bench rc=$? out=$(cat /tmp/bench_r3.out)" >> /tmp/tpu_watch.log

cd experiments
echo "$(date -u +%FT%TZ) mnist zero_one starting" >> /tmp/tpu_watch.log
timeout 14400 python -u sample_mnist_unet.py --results_path results_mnist \
  --n_sampling_seeds 6 > /tmp/mnist_run.log 2>&1
echo "$(date -u +%FT%TZ) mnist rc=$?" >> /tmp/tpu_watch.log
