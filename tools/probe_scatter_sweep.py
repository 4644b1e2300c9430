"""Scatter cost-model sweep: is the row/block DMA descriptor- or
byte-bound, and does DMA depth move it?

Round-3 left an inconsistency the flagship floor model inherits:
  * f32 [2,128] blocks (1 KB): ~30 ns/block (validate_block_rmw)
  * bf16 [2,128] blocks (512 B): ~10.8 ns/block (probe_bf16_block D)
— SAME kernel (ops/row_ops.py scatter_row_blocks), 3x the per-descriptor
cost at 2x the bytes, which contradicts the pure "40M descriptors/s
issue-rate floor" story (BASELINE.md). This sweep measures, in ONE
clean session under the honest scan protocol:

  1. f32 [1,128] rows      (512 B)   40960 rows   scatter_rows_unique
  2. f32 [2,128] blocks    (1 KB)    20480 blocks scatter_row_blocks
  3. f32 [2,128] blocks    (1 KB)    40960 blocks      "
  4. bf16 [2,128] blocks   (512 B)   20480 blocks      "  (probe repro)
  5. f32 [4,128] blocks    (2 KB)    10240 blocks      "
  6. f32 [2,128] blocks    (1 KB)    1.31M blocks (flagship-scale U)
  7. depth sweep: variant 2 with _INFLIGHT_GROUPS in {4, 8, 16, 32}

Outcome feeds bench.py's SCATTER_DESC_PER_S / the flagship floor (a
byte-bound model would halve the modeled scatter floor for bf16 and
change the packed-layout tradeoff).

Run on the live chip: python tools/probe_scatter_sweep.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import json

import jax
import jax.numpy as jnp
import numpy as np

from probe_bf16_block import _honest_ms  # scan-chained + host-read
from keras_rs_tpu.ops import row_ops


def run_variant(name, R_logical, k, dtype, n, out):
    """Scatter n [k,128] blocks into a [R_logical//k, k, 128] table."""
    rng = np.random.default_rng(2)
    dim = 128
    groups = R_logical // k
    idx = rng.choice(groups, size=n, replace=False).astype(np.int32)
    blocks = rng.normal(size=(n, k, dim)).astype(dtype)
    table = jnp.zeros((groups, k, dim), dtype)

    def fn(st, i, r):
        return row_ops.scatter_row_blocks(st, i, r)

    ms = _honest_ms(fn, table, jnp.asarray(idx), jnp.asarray(blocks))
    ns_per_desc = ms * 1e6 / n
    gbps = n * k * dim * np.dtype(dtype).itemsize / (ms * 1e-3) / 1e9
    print(
        f"{name:<34} {n:>9} x {k}x128 {np.dtype(dtype).name:<8}"
        f" {ms:8.3f} ms  {ns_per_desc:7.2f} ns/desc  {gbps:6.1f} GB/s"
    )
    out[name] = {
        "ms": round(ms, 4),
        "ns_per_desc": round(ns_per_desc, 2),
        "gbps": round(gbps, 2),
    }


def run_rows_variant(name, R, dtype, n, out):
    rng = np.random.default_rng(2)
    dim = 128
    idx = rng.choice(R, size=n, replace=False).astype(np.int32)
    rows = rng.normal(size=(n, dim)).astype(dtype)
    table = jnp.zeros((R, dim), dtype)

    def fn(st, i, r):
        return row_ops.scatter_rows_unique(st, i, r)

    ms = _honest_ms(fn, table, jnp.asarray(idx), jnp.asarray(rows))
    ns = ms * 1e6 / n
    gbps = n * dim * np.dtype(dtype).itemsize / (ms * 1e-3) / 1e9
    print(
        f"{name:<34} {n:>9} x 1x128 {np.dtype(dtype).name:<8}"
        f" {ms:8.3f} ms  {ns:7.2f} ns/desc  {gbps:6.1f} GB/s"
    )
    out[name] = {
        "ms": round(ms, 4),
        "ns_per_desc": round(ns, 2),
        "gbps": round(gbps, 2),
    }


def main() -> None:
    print(f"backend: {jax.default_backend()}")
    out: dict = {}
    R = 3_000_000  # logical rows per table (1.5 GB f32)

    run_rows_variant("f32_rows_512B", R, np.float32, 40_960, out)
    run_variant("f32_blocks_1KB_20480", R, 2, np.float32, 20_480, out)
    run_variant("f32_blocks_1KB_40960", R, 2, np.float32, 40_960, out)
    run_variant("bf16_blocks_512B_20480", R, 2, jnp.bfloat16, 20_480, out)
    run_variant("f32_blocks_2KB_10240", R, 4, np.float32, 10_240, out)
    # Flagship-scale unique count (U ~ 1.3M) into a 7M-row table.
    run_variant(
        "f32_blocks_1KB_flagship", 7_000_000, 2, np.float32,
        1_310_720, out,
    )

    # n_valid DMA-group skipping at flagship scale (round 5): the dedup
    # tail is sink padding, and the kernel now skips whole DMA groups
    # past n_valid. 64% models the measured uniform-ids dedup rate
    # (probe_preproc_ops: ~0.9M unique of 1.41M entries).
    def run_nvalid(name, frac):
        rng = np.random.default_rng(2)
        n, k, dim = 1_310_720, 2, 128
        groups = 7_000_000 // k
        idx = rng.choice(groups, size=n, replace=False).astype(np.int32)
        blocks = rng.normal(size=(n, k, dim)).astype(np.float32)
        table = jnp.zeros((groups, k, dim), np.float32)
        nv = jnp.int32(int(n * frac))

        def fn(st, i, r):
            return row_ops.scatter_row_blocks(st, i, r, nv)

        ms = _honest_ms(fn, table, jnp.asarray(idx), jnp.asarray(blocks))
        print(
            f"{name:<34} {n:>9} x {k}x128 float32 "
            f" {ms:8.3f} ms  ({frac:.0%} live)"
        )
        out[name] = {"ms": round(ms, 4), "frac_live": frac}

    run_nvalid("f32_flagship_nvalid_100pct", 1.0)
    run_nvalid("f32_flagship_nvalid_64pct", 0.64)
    run_nvalid("f32_flagship_nvalid_25pct", 0.25)

    # DMA depth sweep: _INFLIGHT_GROUPS is a module constant read at
    # trace time — clear the jit cache between settings.
    base_g, base_s = row_ops._INFLIGHT_GROUPS, row_ops._NSEM
    for depth in (4, 8, 16, 32):
        row_ops._INFLIGHT_GROUPS = depth
        # _NSEM must track the depth: the kernel assigns semaphore
        # j % _NSEM, so in-flight DMAs need _NSEM >= outstanding count
        # or waits would alias across groups.
        row_ops._NSEM = row_ops._UNROLL * depth
        row_ops.scatter_row_blocks.clear_cache()
        run_variant(
            f"f32_blocks_1KB_depth{depth * row_ops._UNROLL}",
            R, 2, np.float32, 20_480, out,
        )
    row_ops._INFLIGHT_GROUPS, row_ops._NSEM = base_g, base_s
    row_ops.scatter_row_blocks.clear_cache()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
