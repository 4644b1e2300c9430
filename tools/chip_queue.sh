#!/usr/bin/env bash
# Round-3 chip work queue: run sequentially on the live TPU (one job at
# a time; the tunnel wedges ~50 min if a process dies mid-op, so no
# tight timeouts — each stage gets a generous cap and logs to its own
# file under /tmp/chip_r3/).
set -uo pipefail
cd /root/repo
OUT=/tmp/chip_r3
mkdir -p "$OUT"

run() {
  local name="$1" cap="$2"; shift 2
  echo "=== $name (cap ${cap}s) start $(date +%T)" | tee -a "$OUT/queue.log"
  timeout "$cap" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name exit $? end $(date +%T)" | tee -a "$OUT/queue.log"
}

# 0. probe — (ones(512,512) @ itself).sum() = 512^3 = 134217728
run probe 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((512,512)); print(float((x@x).sum()))"
grep -q 134217728 "$OUT/probe.log" || { echo "CHIP STILL WEDGED"; exit 1; }

# 1. main bench (f32 + flagship valence)
run bench_f32 3000 python bench.py

# 1b. itemized embedding-path profile (names every fusion >= 30 us so
#     the above-floor overhead is attributed, VERDICT r2 #1)
run profile_emb 1800 python tools/profile_embedding.py --steps 10 --min-us 30

# 2. bf16 bitpacked bench
run bench_bf16 2400 env BENCH_TABLE_DTYPE=bfloat16 BENCH_FLAGSHIP=0 python bench.py

# 3. bf16 + rowwise_adagrad capacity mode
run bench_bf16_rowwise 2400 env BENCH_TABLE_DTYPE=bfloat16 BENCH_EMB_OPTIMIZER=rowwise_adagrad BENCH_FLAGSHIP=0 python bench.py

# 3b. dense-stack precision A/B (VERDICT r2 #8): f32-resident vs
#     bf16-resident activations vs full f32, bench + flagship widths.
run probe_dense 1800 python tools/probe_dense_mfu.py
# 3c. end-to-end bench with the bf16-resident dense stack (adopt as
#     default if it beats bench_f32's step_ms outside noise).
run bench_bf16_dense 2400 env BENCH_DENSE_OUTPUT_DTYPE=bfloat16 BENCH_FLAGSHIP=0 python bench.py

# 4. bitpack kernel validation + A/B
run validate_bitpack 1200 python tools/validate_bitpack.py

# 5. bf16 block-DMA probe (scientific record for the gates)
run probe_bf16_block 1200 python tools/probe_bf16_block.py

# 6. serving latency
run serving 1800 python tools/serving_latency.py

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
