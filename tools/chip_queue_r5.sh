#!/usr/bin/env bash
# Round-5 chip work queue: run sequentially on the live TPU under the
# shared chip lock (mutual exclusion with the driver's bench.py). Same
# stage protocol as rounds 3/4: exit 0 -> done, timeout -> abort the
# whole queue for a wedge cooldown, other nonzero -> recorded fail,
# skipped on retries.
set -uo pipefail
cd /root/repo
OUT=/tmp/chip_r5
mkdir -p "$OUT" "$OUT/done"

run() {
  local name="$1" cap="$2"; shift 2
  if [ -e "$OUT/done/$name" ]; then
    echo "=== $name skipped ($(cat "$OUT/done/$name")) $(date +%T)" | tee -a "$OUT/queue.log"
    return 0
  fi
  echo "=== $name (cap ${cap}s) start $(date +%T)" | tee -a "$OUT/queue.log"
  # KRT_CHIP_LOCK_HELD: bench.py would otherwise try to re-flock the
  # same file from inside our flock and self-deadlock.
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

# 0. probe — never skipped (cheap wedge detector at the top of EVERY
# attempt). (512x512 ones @ itself).sum() = 512^3 = 134217728.
rm -f "$OUT/done/probe"
run probe 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((512,512)); print(float((x@x).sum()))"
grep -q 134217728 "$OUT/probe.log" || { echo "CHIP STILL WEDGED"; exit 1; }

# 1. On-chip parity gate, round-5 hardware float contract (integer
#    arrays bit-exact; folded gains ULP-bounded <= 8 on TPU).
run parity 900 python tools/chip_parity_check.py

# 2. Itemized profile at FLAGSHIP shape with the FIXED capture (python
#    tracer off): names every op >= 50 us so the ~100 ms above-floor
#    remainder is finally attributed (sort? bucket fill? segsum?).
#    THE round-5 decision input — run before any long stage.
run profile_flagship 1800 python tools/profile_embedding.py --steps 5 --min-us 50 --profile mlperf --out "$OUT/prof_flagship"

# 2b. Flagship-scale preprocessing primitive microbench: the
#     preprocess-vs-lookup split + sort-payload scaling + the
#     construction-order dedup primitive costs.
run preproc_ops 1800 python tools/probe_preproc_ops.py

# 3. Main bench: f32 + flagship valence.
run bench_f32 3000 env BENCH_SKIP_PROBE=1 python bench.py

# 4. int8 serving lookup probe with the 2-D shift-based packed layout
#    (the round-4 run OOMed on the tile-padded [G,dim,4] reshape).
run int8_probe 1800 python tools/probe_int8_serving.py --json "$OUT/int8_probe.json"

# 5. End-to-end serving latencies under the two-point timing protocol
#    (the round-4 run printed 0.000 ms for fast configs).
run serving 2400 python tools/serving_latency.py

# 5b. Scatter sweep incl. the n_valid DMA-group-skip A/B at flagship
#     scale (validates the round-5 kernel change compiles + quantifies).
run scatter_nvalid 2400 python tools/probe_scatter_sweep.py

# 6. bf16-resident dense AUC parity (decides dense_output_dtype
#    default): 2000 steps synthetic learnable CTR at batch 8192.
#    Compare to the r3 f32 curve (0.7684@2000).
run mlperf_bf16_dense 3600 python examples/ml_perf/main.py --config smoke_test --num_steps 2000 --global_batch_size 8192 --eval_every 500 --dense_output_dtype bfloat16 --honest_timing

# 7. Learning from FILES, longer run (round-4 reached AUC 0.593@600
#    still climbing; target > 0.65).
run mlperf_files 3600 python tools/mlperf_files_chip.py --steps 2000 --eval-every 250

# 8. Quality plateau (VERDICT r3 #7): 12k steps at batch 8192.
run mlperf_plateau 3600 python examples/ml_perf/main.py --config smoke_test --num_steps 12000 --global_batch_size 8192 --eval_every 1000 --honest_timing

# 9. Capacity modes under the round-5 lookup (construction fwd + sorted
#    hint apply to the bf16 layouts too).
run bench_bf16_rowwise 3000 env BENCH_SKIP_PROBE=1 BENCH_TABLE_DTYPE=bfloat16 BENCH_EMB_OPTIMIZER=rowwise_adagrad BENCH_DENSE_OUTPUT_DTYPE=bfloat16 BENCH_FLAGSHIP=0 python bench.py

echo "=== chip_queue_r5 COMPLETE $(date +%T)" | tee -a "$OUT/queue.log"
