"""Itemize the embedding path's per-op time on the real chip.

VERDICT r2 #1: BENCH_r02 shows ~1.2 ms/step of above-floor time in the
embedding path attributed only to unnamed "small fusions". This tool
names them: it runs the full sharded DLRM pipeline at bench shape under
`jax.profiler.trace`, parses the trace-viewer JSON the TPU runtime
writes (per-op durations ARE trustworthy through the tunnel, unlike
block_until_ready — BASELINE.md), and prints every TPU op >= `--min-us`
averaged per step, so each can be attributed (gather / scatter DMA /
segment-sum / sort / transpose / optimizer math / glue).

Usage (real chip):  python tools/profile_embedding.py [--steps 10]
                    [--min-us 30] [--batch 8192] [--profile mlperf]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def run_trace(steps: int, batch: int, out_dir: str, profile: str) -> None:
    import jax

    import bench
    from keras_rs_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.create_mesh()
    vocab = int(os.environ.get("BENCH_VOCAB", 4_000_000))
    if profile == "mlperf":
        from examples.ml_perf.configs import (
            CRITEO_MULTI_HOT_SIZES,
            CRITEO_VOCAB_SIZES,
        )

        cap = int(os.environ.get("BENCH_VOCAB_CAP", 1_000_000))
        state, step, pre, _, _ = bench.build(
            "sharded", mesh, batch, vocab, 128,
            vocab_sizes=[min(v, cap) for v in CRITEO_VOCAB_SIZES],
            multi_hot_sizes=CRITEO_MULTI_HOT_SIZES,
        )
    else:
        state, step, pre, _, _ = bench.build(
            "sharded", mesh, batch, vocab, 128
        )
    run = bench.make_scan_runner(step, steps)
    state, loss = run(state, pre)  # compile + warm
    _ = float(loss)
    # Host python tracing OFF: the trace-json exporter caps at 1e6
    # events, and the flagship run's python events alone exceed that —
    # the device plane then exports ZERO ops (the round-4 queue's
    # "0 distinct ops" failure). Device (TPU) tracing is unaffected.
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    opts.host_tracer_level = 1
    jax.profiler.start_trace(out_dir, profiler_options=opts)
    state, loss = run(state, pre)
    _ = float(loss)
    jax.profiler.stop_trace()
    del state


def parse_trace(out_dir: str, steps: int, min_us: float) -> list:
    paths = sorted(
        glob.glob(
            os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no trace under {out_dir}")
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # TPU op events live under pids whose process name mentions TPU;
    # host threads are excluded so python/runtime time doesn't pollute.
    tpu_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    if not tpu_pids:
        # Off-TPU (CPU smoke): fall back to every pid that carries
        # complete ("X") events so the parser stays testable.
        tpu_pids = {e["pid"] for e in ev if e.get("ph") == "X"}
    per_op: dict[str, list] = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        per_op[name][0] += dur
        per_op[name][1] += 1
        total += dur
    rows = [
        (tot / steps, cnt, name)
        for name, (tot, cnt) in per_op.items()
        if tot / steps >= min_us
    ]
    rows.sort(reverse=True)
    print(f"total device time/step: {total / steps / 1e3:.3f} ms "
          f"({len(per_op)} distinct ops)")
    print(f"{'us/step':>10} {'count':>6}  op")
    for us, cnt, name in rows:
        print(f"{us:>10.1f} {cnt:>6}  {name[:110]}")
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--min-us", type=float, default=30.0)
    p.add_argument("--out", default="/tmp/emb_prof")
    p.add_argument("--profile", default="bench",
                   choices=["bench", "mlperf"])
    p.add_argument("--parse-only", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke-testing the "
                        "trace capture/parse off-chip)")
    args = p.parse_args()
    if args.cpu:
        # The sandbox pre-imports jax on the tunneled TPU; plain env
        # vars are too late — force in-process (CLAUDE.md).
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.parse_only:
        run_trace(args.steps, args.batch, args.out, args.profile)
    parse_trace(args.out, args.steps, args.min_us)


if __name__ == "__main__":
    main()
