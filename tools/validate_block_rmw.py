"""Live-TPU validation + microbench for the row-interleaved (packed)
table+slot layout and its one-DMA-per-row block scatter.

Hypothesis (VALIDATED): a [128]-lane-wide f32 array is contiguous
row-major in HBM, so each [k, 128] group of a 3-D [R, k, 128] array is
one contiguous byte range. Storing table+slot rows as such groups lets
the backward write both with ONE DMA per logical row (the scatter is
descriptor-rate bound) and fetch both with one axis-0 block gather,
which XLA executes at HBM BYTE speed. Measured (v5e, 40960 unique rows,
6M-row table, k=2): scatter 1.171 ms vs 1.903 ms dual-stream (+62%);
gather 0.076 ms vs 0.436 ms two row gathers (5.7x); full adagrad tail
2.06 ms vs 2.52 ms split. CRITICAL: the 3-D array must flow unreshaped
from gather to the aliased scatter — a reshape in between breaks XLA
buffer aliasing and inserts a full-table copy (measured 21 ms/step).

Run on a healthy chip:  timeout 900 python tools/validate_block_rmw.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

R, N, DIM, K, ITERS = 6_000_001, 40960, 128, 2, 20
HOST_RT = 0.033


def main() -> None:
    import jax
    import jax.numpy as jnp

    from keras_rs_tpu.ops.row_ops import (
        scatter_row_blocks_unique,
        scatter_rows_unique_multi,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    # --- correctness, small shape ---------------------------------------
    r, n = 100_000, 4096
    idx = jnp.asarray(
        np.sort(rng.choice(r, n, replace=False)).astype(np.int32)
    )
    blocks = jnp.asarray(
        rng.standard_normal((n, K, DIM)).astype(np.float32)
    )
    out = scatter_row_blocks_unique(
        jnp.zeros((r, K, DIM)), idx, blocks, use_pallas=True
    )
    out3 = out
    ok = bool(jnp.all(out3[idx[:512]] == blocks[:512]))
    mask = np.ones(r, bool)
    mask[np.asarray(idx)] = False
    untouched = int(np.flatnonzero(mask)[0])
    ok = ok and bool(jnp.all(out3[untouched] == 0.0))
    print(f"[small] block-scatter correctness: {'OK' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        raise SystemExit(1)
    del out, out3, blocks

    # stride-3 (Adam/FTRL) groups compile and land correctly too.
    blocks3 = jnp.asarray(
        rng.standard_normal((n, 3, DIM)).astype(np.float32)
    )
    out3s = scatter_row_blocks_unique(
        jnp.zeros((r, 3, DIM)), idx, blocks3, use_pallas=True
    )
    ok3 = bool(jnp.all(out3s[idx[:256]] == blocks3[:256]))
    print(f"[small] k=3 block-scatter correctness: "
          f"{'OK' if ok3 else 'FAIL'}", flush=True)
    if not ok3:
        raise SystemExit(1)
    del out3s, blocks3

    # --- bench data ------------------------------------------------------
    idx = jnp.asarray(
        np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    )
    rt = jnp.asarray(rng.standard_normal((N, DIM)).astype(np.float32))
    rs = jnp.asarray(rng.standard_normal((N, DIM)).astype(np.float32))
    blocks = jnp.stack([rt, rs], axis=1)  # [N, K, DIM]

    def timed(run, *states):
        # NOTE: each runner returns (final_state..., probe_scalar) — the
        # state must appear in the OUTPUT for jit donation to alias the
        # multi-GB buffers (a scalar-only return leaves them undonated
        # and doubles HBM).
        for _ in range(2):
            s = [jnp.zeros_like(x) for x in states]
            tt = time.perf_counter()
            out = run(*s)
            float(out[-1])
            el = time.perf_counter() - tt
            del out, s
        return (el - HOST_RT) / ITERS * 1e3

    # (a) scatter: dual-stream vs one block kernel
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_dual(t, s):
        def body(c, _):
            o = scatter_rows_unique_multi(
                [c[0], c[1]], idx, [rt, rs], use_pallas=True
            )
            return (o[0], o[1]), ()

        (t, s), _ = jax.lax.scan(body, (t, s), None, length=ITERS)
        return t, s, t[0, 0] + s[0, 0]

    t_dual = timed(run_dual, jnp.zeros((R, DIM)), jnp.zeros((R, DIM)))
    print(f"dual-stream scatter (2x{N} DMAs): {t_dual:.3f} ms", flush=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_block(p):
        def body(c, _):
            return scatter_row_blocks_unique(
                c, idx, blocks, use_pallas=True
            ), ()

        p, _ = jax.lax.scan(body, p, None, length=ITERS)
        return p, p[0, 0, 0]

    t_block = timed(run_block, jnp.zeros((R, K, DIM)))
    print(
        f"block scatter      (1x{N} DMAs): {t_block:.3f} ms "
        f"({(t_dual / t_block - 1) * 100:+.0f}% vs dual)",
        flush=True,
    )

    # (b) gather: two row gathers vs one [K, DIM] block gather
    @jax.jit
    def run_g2(t, s):
        def body(c, _):
            ix = idx + c
            a = jnp.take(t, ix, axis=0, indices_are_sorted=True)
            b = jnp.take(s, ix, axis=0, indices_are_sorted=True)
            nc = (a[0, 0] + b[0, 0] > 1e30).astype(jnp.int32)
            return nc, a[0, 0] + b[0, 0]

        _, outs = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), None, length=ITERS
        )
        return outs[-1]

    t_arr = jnp.asarray(rng.standard_normal((R, DIM)).astype(np.float32))
    s_arr = jnp.asarray(rng.standard_normal((R, DIM)).astype(np.float32))
    for _ in range(2):
        tt = time.perf_counter()
        float(run_g2(t_arr, s_arr))
        el = time.perf_counter() - tt
    print(f"two row gathers: {(el - HOST_RT) / ITERS * 1e3:.3f} ms",
          flush=True)
    g2_ms = (el - HOST_RT) / ITERS * 1e3
    del t_arr, s_arr

    @jax.jit
    def run_gb(p3):
        def body(c, _):
            ix = idx + c
            blk = jnp.take(p3, ix, axis=0, indices_are_sorted=True)
            nc = (blk[0, 0, 0] > 1e30).astype(jnp.int32)
            return nc, blk[0, 0, 0]

        _, outs = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), None, length=ITERS
        )
        return outs[-1]

    p3 = jnp.asarray(
        rng.standard_normal((R, K, DIM)).astype(np.float32)
    )
    for _ in range(2):
        tt = time.perf_counter()
        float(run_gb(p3))
        el = time.perf_counter() - tt
    gb_ms = (el - HOST_RT) / ITERS * 1e3
    print(
        f"one block gather: {gb_ms:.3f} ms "
        f"({(g2_ms / gb_ms - 1) * 100:+.0f}% vs two row gathers)",
        flush=True,
    )
    del p3

    # (c) full backward tail: gather + adagrad math + scatter
    grads = jnp.asarray(rng.standard_normal((N, DIM)).astype(np.float32))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_tail_dual(t, s):
        def body(c, _):
            tt_, ss_ = c
            rows = jnp.take(tt_, idx, axis=0, indices_are_sorted=True)
            acc = jnp.take(ss_, idx, axis=0, indices_are_sorted=True)
            acc2 = acc + grads * grads
            new = rows - 0.01 * grads / (jnp.sqrt(acc2) + 1e-7)
            o = scatter_rows_unique_multi(
                [tt_, ss_], idx, [new, acc2], use_pallas=True
            )
            return (o[0], o[1]), ()

        (t, s), _ = jax.lax.scan(body, (t, s), None, length=ITERS)
        return t, s, t[0, 0] + s[0, 0]

    t_tail_dual = timed(
        run_tail_dual, jnp.zeros((R, DIM)), jnp.zeros((R, DIM))
    )
    print(f"bwd tail, split layout : {t_tail_dual:.3f} ms", flush=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_tail_block(p):
        def body(c, _):
            # NO reshape: c stays 3-D or aliasing breaks (see header).
            blk = jnp.take(
                c, idx, axis=0, indices_are_sorted=True
            )
            rows, acc = blk[:, 0], blk[:, 1]
            acc2 = acc + grads * grads
            new = rows - 0.01 * grads / (jnp.sqrt(acc2) + 1e-7)
            nb = jnp.stack([new, acc2], axis=1)
            return scatter_row_blocks_unique(
                c, idx, nb, use_pallas=True
            ), ()

        p, _ = jax.lax.scan(body, p, None, length=ITERS)
        return p, p[0, 0, 0]

    t_tail_block = timed(run_tail_block, jnp.zeros((R, K, DIM)))
    print(
        f"bwd tail, packed layout: {t_tail_block:.3f} ms "
        f"({(t_tail_dual / t_tail_block - 1) * 100:+.0f}%)",
        flush=True,
    )
    if t_tail_block < t_tail_dual:
        print("VERDICT: packed layout wins — integrate into lookup.py.")
    else:
        print("VERDICT: no win — keep the split layout.")


if __name__ == "__main__":
    main()
