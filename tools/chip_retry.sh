#!/usr/bin/env bash
# Retry wrapper for tools/chip_queue.sh around a wedged TPU tunnel.
# The tunnel recovers ~50 min after a mid-op kill, and every timed-out
# probe is itself a mid-op kill — so wait a full 70 min BETWEEN
# attempts and let chip_queue.sh's single probe decide.
set -u
cd /root/repo
mkdir -p /tmp/chip_r3
for i in 1 2 3 4 5 6; do
  echo "chip_retry: cooldown before attempt $i ($(date +%T))" | tee -a /tmp/chip_r3/retry.log
  sleep 4200
  echo "chip_retry: attempt $i starting ($(date +%T))" | tee -a /tmp/chip_r3/retry.log
  if bash tools/chip_queue.sh; then
    echo "chip_retry: queue COMPLETE ($(date +%T))" | tee -a /tmp/chip_r3/retry.log
    exit 0
  fi
  echo "chip_retry: attempt $i failed — still wedged ($(date +%T))" | tee -a /tmp/chip_r3/retry.log
done
echo "chip_retry: giving up after 6 attempts" | tee -a /tmp/chip_r3/retry.log
exit 1
