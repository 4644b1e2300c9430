#!/usr/bin/env bash
# Retry wrapper for tools/chip_queue_r5.sh around a wedged TPU tunnel.
# The tunnel recovers ~50 min after a mid-op kill, and every timed-out
# probe is itself a mid-op kill — so wait a full 70 min BETWEEN attempts
# and let the queue's single probe decide. First attempt after an
# initial cooldown (arg 1, seconds; default 3600).
set -u
cd /root/repo
mkdir -p /tmp/chip_r5
INITIAL="${1:-3600}"
echo "chip_retry_r5: initial cooldown ${INITIAL}s ($(date +%T))" | tee -a /tmp/chip_r5/retry.log
sleep "$INITIAL"
for i in 1 2 3 4 5 6 7 8; do
  echo "chip_retry_r5: attempt $i starting ($(date +%T))" | tee -a /tmp/chip_r5/retry.log
  if bash tools/chip_queue_r5.sh; then
    echo "chip_retry_r5: queue COMPLETE ($(date +%T))" | tee -a /tmp/chip_r5/retry.log
    exit 0
  fi
  echo "chip_retry_r5: attempt $i failed — cooldown 4200s ($(date +%T))" | tee -a /tmp/chip_r5/retry.log
  sleep 4200
done
echo "chip_retry_r5: giving up after 8 attempts" | tee -a /tmp/chip_r5/retry.log
exit 1
