#!/usr/bin/env bash
# Round-5 FINAL pass: validate + measure the last batch of landed-but-
# unmeasured changes (mode="clip" gathers, RMW_OVERLAP_CHUNKS=4 chunked
# compute/DMA overlap in the fused RMW kernel, 8-lane masked-sum scale
# select in the int8_fused serving layout). Same stage protocol as
# tools/chip_queue_r5.sh.
set -uo pipefail
cd /root/repo
OUT=/tmp/chip_final
mkdir -p "$OUT" "$OUT/done"

run() {
  local name="$1" cap="$2"; shift 2
  if [ -e "$OUT/done/$name" ]; then
    echo "=== $name skipped ($(cat "$OUT/done/$name")) $(date +%T)" | tee -a "$OUT/queue.log"
    return 0
  fi
  echo "=== $name (cap ${cap}s) start $(date +%T)" | tee -a "$OUT/queue.log"
  flock "${KRT_CHIP_LOCK:-/tmp/krt_chip.lock}" \
    env KRT_CHIP_LOCK_HELD=1 timeout "$cap" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc end $(date +%T)" | tee -a "$OUT/queue.log"
  if [ "$rc" -eq 0 ]; then
    echo ok > "$OUT/done/$name"
  elif [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "=== $name TIMED OUT — tunnel likely wedged; aborting queue for cooldown" | tee -a "$OUT/queue.log"
    exit 1
  else
    echo "fail rc=$rc" > "$OUT/done/$name"
  fi
}

rm -f "$OUT/done/probe"
run probe 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((512,512)); print(float((x@x).sum()))"
grep -q 134217728 "$OUT/probe.log" || { echo "CHIP STILL WEDGED"; exit 1; }

# 1. Parity gate — compiles + runs the chunked-overlap fused RMW kernel
#    on hardware for the first time. If this FAILS on the overlap
#    kernel: set row_ops.RMW_OVERLAP_CHUNKS = 1 and re-queue.
run parity 900 python tools/chip_parity_check.py

# 2. Main bench: clip-mode gathers + chunked RMW overlap. Expect
#    flagship ~90-95 ms (pass-3 measured 104.9 with 10.7 ms of OOB
#    selects and ~6.5 ms of exposed VPU compute in the kernel).
run bench_f32 3000 env BENCH_SKIP_PROBE=1 python bench.py

# 3. int8 serving probe with the fixed fused layout (masked-sum scale
#    select instead of N one-element take_along_axis gathers).
run int8_probe 1800 python tools/probe_int8_serving.py --json "$OUT/int8_probe.json"

# 4. End-to-end serving latency table (two-point protocol).
run serving 2400 python tools/serving_latency.py

echo "=== chip_queue_final COMPLETE $(date +%T)" | tee -a "$OUT/queue.log"
