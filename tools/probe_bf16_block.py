"""Hardware probe: are bf16 [k>=2, 128] BLOCKS DMA-sliceable on TPU?

Round-2 established (on the live chip) that a SINGLE bf16 row cannot be
memref-sliced for a Pallas DMA: bf16 VMEM/HBM uses (16, 128) tiling with
two logical rows interleaved per 32-bit sublane, so one row is a
16-bit-strided pattern no DMA descriptor expresses. Gates in
ops/row_ops.py route bf16 tables to XLA's ~7 GB/s scatter as a result
(1.08M vs 2.01M ex/s at bench shape — BASELINE.md).

VERDICT r2 #4a asks the follow-up this tool answers: a [2, 128] bf16
block covering rows (2r, 2r+1) is EXACTLY one sublane-pair's packed
contents — aligned, contiguous 512 bytes in HBM — so it may well be
sliceable where the single row is not. If it is, bf16 table updates can
run through a pair-RMW formulation of the block kernel (gather the
paired rows at byte speed, merge the updated rows in, scatter [2, 128]
blocks at descriptor rate) instead of XLA's scatter.

Stages (each reports PASS/FAIL; a compile failure is an answer, not an
error — that is why this must run on the real chip, CPU interpret mode
cannot see Mosaic compile failures):
  A. scatter_row_blocks on a bf16 [R, 2, 128] packed array: compile +
     bit-exact vs XLA `.at[].set`.
  B. same for [R, 4, 128] (wider block, same question at k=4).
  C. reshape cost: is [R/2, 2, 128] <-> [R, 128] bf16 a bitcast or a
     copy in the lowered HLO? (Decides whether a paired-layout table can
     serve gathers through a flat view for free.)
  D. honest timing at bench update shape (20480 blocks = 40960 rows into
     a 3M-row table): pallas pair-block scatter vs XLA row scatter.

Usage: run on the live chip (no env overrides), results go to stdout;
record them in BASELINE.md and set the gates in ops/row_ops.py.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from keras_rs_tpu.ops import row_ops


def stage_a_correctness(k: int) -> bool:
    R, dim, n = 4096, 128, 512
    rng = np.random.default_rng(0)
    packed = rng.normal(size=(R, k, dim)).astype(jnp.bfloat16)
    idx = rng.choice(R, size=n, replace=False).astype(np.int32)
    blocks = rng.normal(size=(n, k, dim)).astype(jnp.bfloat16)

    want = np.asarray(
        jnp.asarray(packed).at[jnp.asarray(idx)].set(jnp.asarray(blocks))
    )
    try:
        got = row_ops.scatter_row_blocks_unique(
            jnp.asarray(packed),
            jnp.asarray(idx),
            jnp.asarray(blocks),
            use_pallas=True,
        )
        got = np.asarray(jax.block_until_ready(got))
    except Exception:
        print(f"[A k={k}] FAIL — kernel did not compile/run:")
        traceback.print_exc(limit=3)
        return False
    ok = np.array_equal(got.view(np.uint16), want.view(np.uint16))
    print(f"[A k={k}] {'PASS' if ok else 'MISMATCH'} — bf16 "
          f"[{k},128] block DMA compiled; bit-exact={ok}")
    return ok


def stage_c_reshape() -> None:
    R, dim = 8192, 128

    def flat_gather(packed, ids):
        flat = packed.reshape(R, dim)  # [R/2, 2, 128] -> [R, 128]
        return jnp.take(flat, ids, axis=0)

    packed = jnp.zeros((R // 2, 2, dim), jnp.bfloat16)
    ids = jnp.arange(64, dtype=jnp.int32)
    hlo = (
        jax.jit(flat_gather)
        .lower(packed, ids)
        .compile()
        .as_text()
    )
    n_copy = hlo.count(" copy(")
    n_bitcast = hlo.count("bitcast")
    print(f"[C] reshape [R/2,2,128]->[R,128] bf16: copies={n_copy} "
          f"bitcasts={n_bitcast} "
          f"({'FREE (view)' if n_copy == 0 else 'COSTS A COPY'})")


def _honest_ms(fn, state, idx, rows, iters=30) -> float:
    """Scan-chained + host-read timing (BASELINE.md protocol). The body
    consumes the carry in the update values and derives the next carry
    from the scattered data, so XLA cannot hoist or DCE it."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, idx, rows):
        def body(carry, _):
            st, tick = carry
            r = rows + tick.astype(rows.dtype)
            st2 = fn(st, idx, r)
            flat = st2.reshape(-1)
            tick2 = (flat[0].astype(jnp.float32) > 1e30).astype(
                jnp.float32
            )
            return (st2, tick2), tick2

        (st_f, _), ticks = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.float32)), None,
            length=iters,
        )
        return st_f, ticks[-1]

    st, t = run(state, idx, rows)
    _ = float(t)  # warm/compile
    t0 = time.perf_counter()
    st, t = run(st, idx, rows)
    _ = float(t)
    el = time.perf_counter() - t0
    del st
    return max(el - 0.033, 1e-9) / iters * 1e3


def stage_d_timing() -> None:
    R, dim, n_rows = 3_000_000, 128, 40960
    rng = np.random.default_rng(1)
    n_blocks = n_rows // 2
    idx_b = rng.choice(R // 2, size=n_blocks, replace=False).astype(
        np.int32
    )
    blocks = rng.normal(size=(n_blocks, 2, dim)).astype(jnp.bfloat16)
    packed = jnp.zeros((R // 2, 2, dim), jnp.bfloat16)

    def pallas_fn(st, idx, r):
        return row_ops.scatter_row_blocks(st, idx, r)

    ms_p = _honest_ms(pallas_fn, packed, jnp.asarray(idx_b),
                      jnp.asarray(blocks))
    print(f"[D] pallas bf16 [2,128]-block scatter, {n_blocks} blocks "
          f"({n_rows} rows): {ms_p:.3f} ms")
    del packed

    idx_r = rng.choice(R, size=n_rows, replace=False).astype(np.int32)
    rows = rng.normal(size=(n_rows, dim)).astype(jnp.bfloat16)
    table = jnp.zeros((R, dim), jnp.bfloat16)

    def xla_fn(st, idx, r):
        return st.at[idx].set(r, unique_indices=True)

    ms_x = _honest_ms(xla_fn, table, jnp.asarray(idx_r),
                      jnp.asarray(rows))
    print(f"[D] XLA bf16 row scatter, {n_rows} rows: {ms_x:.3f} ms "
          f"(pallas blocks are {ms_x / ms_p:.2f}x)")


def main() -> None:
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if jax.default_backend() != "tpu":
        print("NOT on TPU — compile-failure probing is meaningless here")
        return
    ok2 = stage_a_correctness(2)
    stage_a_correctness(4)
    stage_c_reshape()
    if ok2:
        stage_d_timing()


if __name__ == "__main__":
    main()
