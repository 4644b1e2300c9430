#!/usr/bin/env bash
# Round-4 chip work queue: run sequentially on the live TPU under the
# shared chip lock (mutual exclusion with the driver's bench.py). Same
# stage protocol as round 3 (tools/chip_queue.sh): exit 0 -> done,
# timeout -> abort the whole queue for a wedge cooldown, other nonzero
# -> recorded fail, skipped on retries.
set -uo pipefail
cd /root/repo
OUT=/tmp/chip_r4
mkdir -p "$OUT" "$OUT/done"

run() {
  local name="$1" cap="$2"; shift 2
  if [ -e "$OUT/done/$name" ]; then
    echo "=== $name skipped ($(cat "$OUT/done/$name")) $(date +%T)" | tee -a "$OUT/queue.log"
    return 0
  fi
  echo "=== $name (cap ${cap}s) start $(date +%T)" | tee -a "$OUT/queue.log"
  # KRT_CHIP_LOCK_HELD: bench.py would otherwise try to re-flock the
  # same file from inside our flock and self-deadlock (flock denies a
  # second lock via a fresh fd even in a child).
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

# 1. On-chip parity gate for the round-4 slot-major contract (cheap;
#    everything downstream is meaningless if this fails).
run parity 900 python tools/chip_parity_check.py

# 2. Main bench: f32 + flagship valence with the new preprocessing
#    (sum-combiner divisor skip, fused single-key sort, sort-free D=1
#    dedup). Target: flagship_step_ms < 80 (VERDICT r3 next #2).
run bench_f32 3000 env BENCH_SKIP_PROBE=1 python bench.py

# 3. Itemized profile at FLAGSHIP shape: names every op >= 30 us so the
#    remaining above-floor time is attributed (sort? scatter? segsum?).
run profile_flagship 1800 python tools/profile_embedding.py --steps 5 --min-us 50 --profile mlperf --out /tmp/chip_r4/prof_flagship

# 4. Dense-only stability: the scan 5x in ONE clean session -> mean+-std
#    (VERDICT r3 next #4; round-3 spread was +-35% across sessions).
run dense_stability 2400 env BENCH_SKIP_PROBE=1 BENCH_DENSE_REPEATS=5 BENCH_FLAGSHIP=0 BENCH_SKIP_NAIVE=1 python bench.py

# 5. int8 serving lookup probe (VERDICT r3 next #8): which formulation
#    closes the 1.5-3.4x gap.
run int8_probe 1800 python tools/probe_int8_serving.py --json /tmp/chip_r4/int8_probe.json

# 5b. End-to-end serving latencies incl. the new int8_packed layout.
run serving 2400 python tools/serving_latency.py

# 5c. Scatter cost-model sweep (descriptor- vs byte-bound + DMA depth):
#     recalibrates SCATTER_DESC_PER_S / the flagship floor.
run scatter_sweep 2400 python tools/probe_scatter_sweep.py

# 6. Capacity modes with the new preprocessing.
run bench_bf16 3000 env BENCH_SKIP_PROBE=1 BENCH_TABLE_DTYPE=bfloat16 BENCH_FLAGSHIP=0 python bench.py
run bench_bf16_rowwise 3000 env BENCH_SKIP_PROBE=1 BENCH_TABLE_DTYPE=bfloat16 BENCH_EMB_OPTIMIZER=rowwise_adagrad BENCH_DENSE_OUTPUT_DTYPE=bfloat16 BENCH_FLAGSHIP=0 python bench.py

# 7. bf16-resident dense AUC parity (VERDICT r3 next #4 quality arm):
#    2000 steps synthetic learnable CTR at batch 8192, bf16-resident
#    dense. Compare to the r3 f32 curve (0.7684@2000).
run mlperf_bf16_dense 3600 python examples/ml_perf/main.py --config smoke_test --num_steps 2000 --global_batch_size 8192 --eval_every 500 --dense_output_dtype bfloat16 --honest_timing

# 8. Learning from FILES (VERDICT r3 next #6): learnable-CTR labels,
#    held-out val files; target AUC > 0.65.
run mlperf_files 3600 python tools/mlperf_files_chip.py --steps 600 --eval-every 200

# 9. Quality plateau (VERDICT r3 next #7): 12k steps at batch 8192
#    (r3's 2000-step curve was still rising; 149 s of the 3600 s cap
#    used, so 12k fits comfortably).
run mlperf_plateau 3600 python examples/ml_perf/main.py --config smoke_test --num_steps 12000 --global_batch_size 8192 --eval_every 1000 --honest_timing

echo "=== chip_queue_r4 COMPLETE $(date +%T)" | tee -a "$OUT/queue.log"
