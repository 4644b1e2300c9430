"""Live-TPU validation for the multi-stream scatter kernel.

Run on a healthy TPU chip:

    timeout 600 python tools/validate_multi_scatter.py

Stages (each under its own deadline, smallest first so a failure is
cheap to attribute):
  1. correctness at a small shape (fast compile),
  2. correctness at the bench shape,
  3. honest microbench (scan-chained, host-read, DCE-proof) of the
     dual-stream kernel vs two single-stream kernels.

If all three pass and the dual-stream kernel wins, flip
`keras_rs_tpu.ops.row_ops.MULTI_STREAM_AUTO` to True (and delete the
gate comment's "pending validation" clause) so the embedding backward
uses it by default.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from keras_rs_tpu.ops.row_ops import (
        scatter_rows_unique,
        scatter_rows_unique_multi,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()

    def check(R, N, dim, label):
        rng = np.random.default_rng(0)
        idx = jnp.asarray(
            np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
        )
        rt = jnp.asarray(rng.standard_normal((N, dim), dtype=np.float32))
        rs = jnp.asarray(rng.standard_normal((N, dim), dtype=np.float32))
        outs = scatter_rows_unique_multi(
            [jnp.zeros((R, dim)), jnp.zeros((R, dim))],
            idx,
            [rt, rs],
            use_pallas=True,
        )
        probe = min(N, 512)
        ok = bool(jnp.all(outs[0][idx[:probe]] == rt[:probe])) and bool(
            jnp.all(outs[1][idx[:probe]] == rs[:probe])
        )
        # Rows NOT in idx must stay zero (no stray DMA writes).
        mask = np.ones(R, bool)
        mask[np.asarray(idx)] = False
        untouched = int(np.flatnonzero(mask)[0])
        ok = ok and bool(jnp.all(outs[0][untouched] == 0.0))
        print(f"[{label}] correctness: {'OK' if ok else 'FAIL'}",
              flush=True)
        if not ok:
            raise SystemExit(1)

    check(100_000, 4096, 128, "small")
    check(6_000_001, 40960, 128, "bench-shape")

    # Honest microbench (see BASELINE.md "honest timing protocol").
    import functools

    R, N, dim, iters = 6_000_001, 40960, 128, 20
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    )
    rt = jnp.asarray(rng.standard_normal((N, dim), dtype=np.float32))
    rs = jnp.asarray(rng.standard_normal((N, dim), dtype=np.float32))

    def timed(f):
        # The donated state MUST appear in the output or donation fails
        # silently and every scan iteration copies both 3 GB buffers
        # (CLAUDE.md); only the scalar is host-read.
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(t, s, ix, a, b):
            def body(c, _):
                t2, s2 = f(c[0], c[1], ix, a, b)
                return (t2, s2), ()
            (t, s), _ = jax.lax.scan(body, (t, s), None, length=iters)
            return t, s, t[0, 0] + s[0, 0]

        for rep in range(2):
            t0 = jnp.zeros((R, dim), jnp.float32)
            s0 = jnp.zeros((R, dim), jnp.float32)
            tt = time.perf_counter()
            out = run(t0, s0, idx, rt, rs)
            float(out[-1])
            el = time.perf_counter() - tt
            del out, t0, s0
        return (el - 0.033) / iters * 1e3

    def singles(t, s, ix, a, b):
        return (
            scatter_rows_unique(t, ix, a),
            scatter_rows_unique(s, ix, b),
        )

    def dual(t, s, ix, a, b):
        o = scatter_rows_unique_multi([t, s], ix, [a, b],
                                      use_pallas=True)
        return o[0], o[1]

    t_single = timed(singles)
    print(f"two single-stream kernels: {t_single:.3f} ms", flush=True)
    t_dual = timed(dual)
    print(f"one dual-stream kernel   : {t_dual:.3f} ms "
          f"({(t_single / t_dual - 1) * 100:+.0f}%)", flush=True)
    if t_dual < t_single:
        print("VERDICT: dual-stream wins — flip MULTI_STREAM_AUTO=True "
              "in keras_rs_tpu/ops/row_ops.py and re-run bench.py.")
    else:
        print("VERDICT: no win at this shape — keep the gate off.")


if __name__ == "__main__":
    main()
