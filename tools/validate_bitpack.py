"""On-chip validation + A/B timing of the bit-packed bf16 table layout.

Stages (run on the live chip; CPU interpret tests cover semantics but
cannot see Mosaic behavior or real rates):

  1. Correctness at scale: a jitted gather->update->scatter RMW cycle on
     a 3M-row bitpacked table matches the flat-bf16 XLA oracle bit for
     bit, and the lowered HLO contains a tpu_custom_call (the Pallas
     kernel is actually engaged for the f32-typed words).
  2. Honest A/B (scan-chained + host read, BASELINE.md protocol):
     full RMW cycle (gather rows + merge + scatter) per step,
     bitpacked-Pallas vs split-bf16-XLA, 40960 updates into 3M rows.

Record results in BASELINE.md; the layout gate lives in
stacking.build_stacks (bf16 + dim%128==0 + dim<=128).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from keras_rs_tpu.ops import bitpack
from keras_rs_tpu.ops.row_ops import scatter_rows_unique

HOST_RT = 0.033


def stage_correctness() -> None:
    R, dim, n = 100_000, 128, 4096
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((R, dim)).astype(jnp.bfloat16))
    words = bitpack.pack_rows(t)
    ids = jnp.asarray(
        np.sort(rng.choice(R, size=n, replace=False)).astype(np.int32)
    )
    delta = jnp.asarray(
        rng.standard_normal((n, dim)).astype(np.float32)
    )

    @jax.jit
    def rmw_packed(words, ids, delta):
        rows, pair_words = bitpack.take_rows(
            words, ids, indices_are_sorted=True
        )
        new_rows = (rows.astype(jnp.float32) + delta).astype(
            jnp.bfloat16
        )
        pair, merged = bitpack.merge_updated_rows(
            pair_words, ids, new_rows
        )
        return scatter_rows_unique(words, pair, merged)

    hlo = jax.jit(rmw_packed).lower(words, ids, delta).compile().as_text()
    n_cc = hlo.count("tpu_custom_call")
    print(f"[1] tpu_custom_call count in packed RMW: {n_cc} "
          f"({'Pallas ENGAGED' if n_cc else 'NOT engaged!'})")

    got = bitpack.unpack_rows(rmw_packed(jnp.array(words), ids, delta))
    want = t.at[ids].set(
        (jnp.take(t, ids, axis=0).astype(jnp.float32) + delta).astype(
            jnp.bfloat16
        )
    )
    ok = np.array_equal(
        np.asarray(got).view(np.uint16), np.asarray(want).view(np.uint16)
    )
    print(f"[1] bit-exact at 100k rows / 4096 updates: {ok}")
    assert ok


def _honest_ms(step, state, ids, delta, iters=30) -> float:
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, ids, delta):
        def body(carry, _):
            st, tick = carry
            d = delta + tick
            st2 = step(st, ids, d)
            tick2 = (
                st2.reshape(-1)[0].astype(jnp.float32) > 1e38
            ).astype(jnp.float32)
            return (st2, tick2), tick2

        (st_f, _), ticks = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.float32)), None, length=iters
        )
        return st_f, ticks[-1]

    st, tk = run(state, ids, delta)
    _ = float(tk)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, tk = run(st, ids, delta)
        _ = float(tk)
        ts.append(max(time.perf_counter() - t0 - HOST_RT, 1e-9))
    del st
    return float(np.median(ts)) / iters * 1e3


def stage_timing() -> None:
    R, dim, n = 3_000_000, 128, 40960
    rng = np.random.default_rng(1)
    ids = jnp.asarray(
        np.sort(rng.choice(R, size=n, replace=False)).astype(np.int32)
    )
    delta = jnp.asarray(rng.standard_normal((n, dim)).astype(np.float32))

    def step_packed(words, ids, d):
        rows, pair_words = bitpack.take_rows(
            words, ids, indices_are_sorted=True
        )
        new_rows = (rows.astype(jnp.float32) + d).astype(jnp.bfloat16)
        pair, merged = bitpack.merge_updated_rows(
            pair_words, ids, new_rows
        )
        return scatter_rows_unique(words, pair, merged)

    words = bitpack.pack_rows(jnp.zeros((R, dim), jnp.bfloat16))
    ms_p = _honest_ms(step_packed, words, ids, delta)
    print(f"[2] bitpacked RMW (gather+merge+Pallas scatter), {n} rows "
          f"into {R}: {ms_p:.3f} ms/step")

    def step_split(table, ids, d):
        rows = jnp.take(table, ids, axis=0, indices_are_sorted=True)
        new_rows = (rows.astype(jnp.float32) + d).astype(jnp.bfloat16)
        return table.at[ids].set(new_rows, unique_indices=True)

    table = jnp.zeros((R, dim), jnp.bfloat16)
    ms_s = _honest_ms(step_split, table, ids, delta)
    print(f"[2] split bf16 RMW (XLA scatter): {ms_s:.3f} ms/step "
          f"(bitpacked is {ms_s / ms_p:.2f}x)")


def stage_gather_shape_probe() -> None:
    """Is an axis-0 gather on a [R, 1, dim] 3-D array faster than the
    same gather on [R, dim]? The round-2 profile measured 3-D block
    gathers at HBM byte speed (0.076 ms for 40960 x [2,128]) vs 0.24 ms
    descriptor-bound 2-D row gathers — if the 3-D lowering wins at
    stride 1 too, the bitpacked (and plain) tables should store a dummy
    middle axis purely for gather speed."""
    R, dim, n = 3_000_000, 128, 40960
    rng = np.random.default_rng(2)
    ids = jnp.asarray(
        np.sort(rng.choice(R, size=n, replace=False)).astype(np.int32)
    )

    def timed_gather(arr, label):
        @jax.jit
        def run(arr, ids):
            def body(carry, _):
                rows = jnp.take(arr, ids + carry, axis=0)
                c2 = (
                    rows.reshape(-1)[0].astype(jnp.float32) > 1e38
                ).astype(jnp.int32)
                return c2, c2

            last, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32), None, length=30
            )
            return last

        _ = float(run(arr, ids))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(arr, ids))
            ts.append(max(time.perf_counter() - t0 - HOST_RT, 1e-9))
        ms = float(np.median(ts)) / 30 * 1e3
        print(f"[3] gather {label}: {ms:.3f} ms for {n} rows")
        return ms

    flat = jnp.zeros((R, dim), jnp.float32)
    timed_gather(flat, "[R, 128] 2-D")
    del flat
    three = jnp.zeros((R, 1, dim), jnp.float32)
    timed_gather(three, "[R, 1, 128] 3-D")
    del three


def main() -> None:
    print(f"backend: {jax.default_backend()}")
    stage_correctness()
    if jax.default_backend() == "tpu":
        stage_timing()
        stage_gather_shape_probe()


if __name__ == "__main__":
    main()
