#!/usr/bin/env bash
# Round-3 chip work queue: run sequentially on the live TPU (one job at
# a time; the tunnel wedges ~50 min if a process dies mid-op, so no
# tight timeouts — each stage gets a generous cap and logs to its own
# file under /tmp/chip_r3/).
set -uo pipefail
cd /root/repo
OUT=/tmp/chip_r3
mkdir -p "$OUT"

# Stage protocol: a stage that exits 0 is marked done and skipped on
# retry attempts; a stage that hits its timeout (124) very likely died
# mid-TPU-op and wedged the tunnel — ABORT the whole queue so the
# chip_retry.sh cooldown runs, instead of burning every later stage's
# cap against a dead tunnel (each kill extends the wedge). A stage that
# fails on its own (nonzero, not timeout) is recorded and skipped on
# retries — deterministic failures don't deserve chip time twice.
mkdir -p "$OUT/done"
run() {
  local name="$1" cap="$2"; shift 2
  if [ -e "$OUT/done/$name" ]; then
    echo "=== $name skipped ($(cat "$OUT/done/$name")) $(date +%T)" | tee -a "$OUT/queue.log"
    return 0
  fi
  echo "=== $name (cap ${cap}s) start $(date +%T)" | tee -a "$OUT/queue.log"
  # flock: mutual exclusion with the driver's bench.py run (it takes
  # the same lock) — round 3's official BENCH JSON was corrupted by
  # exactly this race (VERDICT r3 weak #1).
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

# 0. probe — (ones(512,512) @ itself).sum() = 512^3 = 134217728
# The probe is never skipped: it is the cheap wedge detector that must
# run at the top of EVERY attempt (a mid-queue wedge on the previous
# attempt leaves the tunnel dead even though the probe once passed).
rm -f "$OUT/done/probe"
run probe 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((512,512)); print(float((x@x).sum()))"
grep -q 134217728 "$OUT/probe.log" || { echo "CHIP STILL WEDGED"; exit 1; }

# 1. main bench (f32 + flagship valence)
run bench_f32 3000 env BENCH_SKIP_PROBE=1 python bench.py

# 1b. itemized embedding-path profile (names every fusion >= 30 us so
#     the above-floor overhead is attributed, VERDICT r2 #1)
run profile_emb 1800 python tools/profile_embedding.py --steps 10 --min-us 30

# 1c. pipelined-embedding A/B (one-step-stale SparseCore semantics,
#     training/pipelined.py): pipelined_step_ms vs step_ms on one chip.
run bench_pipeline 2400 env BENCH_SKIP_PROBE=1 BENCH_PIPELINE=1 BENCH_FLAGSHIP=0 python bench.py

# 2. bf16 bitpacked bench
run bench_bf16 2400 env BENCH_SKIP_PROBE=1 BENCH_TABLE_DTYPE=bfloat16 BENCH_FLAGSHIP=0 python bench.py

# 3. bf16 + rowwise_adagrad capacity mode
run bench_bf16_rowwise 2400 env BENCH_SKIP_PROBE=1 BENCH_TABLE_DTYPE=bfloat16 BENCH_EMB_OPTIMIZER=rowwise_adagrad BENCH_FLAGSHIP=0 python bench.py

# 3b. dense-stack precision A/B (VERDICT r2 #8): f32-resident vs
#     bf16-resident activations vs full f32, bench + flagship widths.
run probe_dense 1800 python tools/probe_dense_mfu.py
# 3c. end-to-end bench with the bf16-resident dense stack (adopt as
#     default if it beats bench_f32's step_ms outside noise).
run bench_bf16_dense 2400 env BENCH_SKIP_PROBE=1 BENCH_DENSE_OUTPUT_DTYPE=bfloat16 BENCH_FLAGSHIP=0 python bench.py

# 4. bitpack kernel validation + A/B
run validate_bitpack 1200 python tools/validate_bitpack.py

# 5. bf16 block-DMA probe (scientific record for the gates)
run probe_bf16_block 1200 python tools/probe_bf16_block.py

# 6. serving latency
run serving 1800 python tools/serving_latency.py

# 6b. flagship pipeline from REAL file-batched TFRecords (VERDICT r2
#     missing #1): files -> fixed-column native loader -> COO preprocess
#     -> chip, honest device timing included.
run mlperf_files 2400 python tools/mlperf_files_chip.py --steps 300

# 7. ml_perf plateau at bench-scale batch: AUC curve + honest timing +
#    checkpoints, then a RESUME run continuing from the last checkpoint
#    (failure-recovery evidence on chip).
run mlperf_plateau 3600 python -c "
from examples.ml_perf.main import main
r = main('smoke_test', global_batch_size=8192, num_steps=2000,
         eval_every=200, honest_timing=True,
         checkpoint_dir='/tmp/chip_r3/ckpt', checkpoint_every=500)
print('RESULTS', r)
"
run mlperf_resume 1800 python -c "
from examples.ml_perf.main import main
r = main('smoke_test', global_batch_size=8192, num_steps=2500,
         eval_every=250, checkpoint_dir='/tmp/chip_r3/ckpt',
         checkpoint_every=500)
print('RESUMED_RESULTS', r)
"
echo "queue done $(date +%T)" | tee -a "$OUT/queue.log"
