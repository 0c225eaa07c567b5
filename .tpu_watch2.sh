#!/bin/bash
# Stage-2 watcher: waits for the primary watcher (.tpu_watch.sh) to finish
# its MNIST zero_one run (it logs "mnist rc=" to /tmp/tpu_watch.log), then
# runs the 10-digit MixtureNice experiment. Survives session restarts.
cd /root/repo/experiments
while ! grep -q "mnist rc=" /tmp/tpu_watch.log 2>/dev/null; do
  sleep 300
done
echo "$(date -u +%FT%TZ) stage2: zero_one finished; starting 10-digit mnist" >> /tmp/tpu_watch.log
timeout 21600 python -u sample_mnist_unet.py --target_type mnist \
  --results_path results_mnist --n_sampling_seeds 4 \
  > /tmp/mnist10_run.log 2>&1
echo "$(date -u +%FT%TZ) stage2: mnist10 rc=$?" >> /tmp/tpu_watch.log
