"""On-chip parity gate for the preprocessing contract + kernels.

Run FIRST in every chip queue (cheap, <2 min): asserts on the REAL TPU
that (a) the jitted device COO preprocessing produces BIT-IDENTICAL
arrays to the numpy host backend — the slot-major entry-order contract
of round 4 — at D=1 (the single-chip layout with the sort-free dedup
fast path) across multiple shapes/combiners/weights, and (b) one
sharded DLRM train step produces a finite, sane loss with the Pallas
update path engaged (tpu_custom_call in the lowered step).

CPU tests prove the three backends agree with each other; this proves
the TPU backend (Mosaic kernels, TPU sort/scatter lowerings) agrees
with them too.

Float contract on HARDWARE (amended after the first on-TPU run,
/tmp/chip_r4/parity.log): integer arrays (ids, slots, segments) are
bit-exact on every backend; the f32 FOLDED GAINS and divisors are
bit-exact across the host backends (numpy / C++ / device-on-CPU —
CI-enforced) but only ULP-BOUNDED on TPU, because TPU lowers f32
divide to reciprocal-multiply (non-IEEE under
--xla_allow_excess_precision) and segment-sum accumulation order is
hardware-scheduled. This gate asserts: identical zero/nonzero pattern,
and every nonzero element within _GAIN_ULP_TOL ULPs of the host value.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import numpy as np

_GAIN_ULP_TOL = 8


def _ulp_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise ULP distance between two same-shape f32 arrays.

    Uses the standard monotone int32 reinterpretation (sign-folded
    two's complement), so the distance is the number of representable
    f32 values between a and b. 0 means bit-identical.
    """
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    ai = np.where(ai < 0, np.int64(-(2**31)) - ai, ai)
    bi = np.where(bi < 0, np.int64(-(2**31)) - bi, bi)
    return np.abs(ai - bi)


def check_preprocess_parity() -> None:
    import jax
    import jax.numpy as jnp

    from keras_rs_tpu.layers.embedding import preprocessing
    from keras_rs_tpu.layers.embedding.config import (
        FeatureConfig,
        TableConfig,
    )
    from keras_rs_tpu.layers.embedding.device_preprocessing import (
        preprocess_stack_device,
    )
    from keras_rs_tpu.layers.embedding.stacking import build_stacks

    rng = np.random.default_rng(7)
    for trial, (B, L, vocab, combiner, weighted) in enumerate(
        [
            (256, 8, 50_000, "sum", False),
            (256, 8, 50_000, "mean", True),
            (128, 16, 30_000, "sqrtn", True),
            (512, 4, 100_000, "sum", True),
        ]
    ):
        tables = [
            TableConfig(
                name=f"t{i}",
                vocabulary_size=vocab // (i + 1),
                embedding_dim=64,
                combiner=combiner,
                max_ids_per_partition=B * L * 3,
                max_unique_ids_per_partition=B * L * 3,
            )
            for i in range(2)
        ]
        feats = [
            FeatureConfig(
                name=f"f{i}",
                table=tables[i % 2],
                input_shape=(B, L),
                output_shape=(B, 64),
            )
            for i in range(3)
        ]
        stacks = build_stacks(feats, num_shards=1)
        (stack,) = stacks
        inputs = {
            f"f{i}": rng.integers(
                -2, vocab, size=(B, L), dtype=np.int64
            )
            for i in range(3)
        }
        weights = (
            {
                f"f{i}": rng.random((B, L)).astype(np.float32)
                * (rng.random((B, L)) > 0.1)
                for i in range(3)
            }
            if weighted
            else None
        )
        host, _ = preprocessing.preprocess_stack(
            stack, inputs, weights, backend="numpy"
        )
        dev_fn = jax.jit(
            lambda ins, ws: preprocess_stack_device(stack, ins, ws)[0]
        )
        dev = dev_fn(
            {k: jnp.asarray(v) for k, v in inputs.items()},
            None
            if weights is None
            else {k: jnp.asarray(v) for k, v in weights.items()},
        )
        max_ulp = 0
        for k, h in host.arrays().items():
            d = np.asarray(dev[k])
            if h.dtype == np.float32:
                # Hardware float contract: same zero pattern, nonzeros
                # within _GAIN_ULP_TOL ULPs (see module docstring).
                assert np.array_equal(d == 0, h == 0), (
                    f"trial {trial}: {k} zero-pattern mismatch on TPU "
                    f"({((d == 0) != (h == 0)).sum()} of {h.size})"
                )
                ulp = _ulp_distance(d, h)
                max_ulp = max(max_ulp, int(ulp.max()))
                assert ulp.max() <= _GAIN_ULP_TOL, (
                    f"trial {trial}: {k} exceeds {_GAIN_ULP_TOL} ULP on "
                    f"TPU (max {int(ulp.max())} ULP, "
                    f"{(ulp > _GAIN_ULP_TOL).sum()} of {h.size} over, "
                    f"{(ulp > 0).sum()} nonexact)"
                )
            else:
                assert np.array_equal(d, h), (
                    f"trial {trial}: {k} mismatch on TPU "
                    f"({(d != h).sum()} of {h.size} elements)"
                )
        print(f"[parity trial {trial}] PASS "
              f"(B={B} L={L} combiner={combiner} weighted={weighted} "
              f"max_gain_ulp={max_ulp})")


def check_train_step() -> None:
    import jax

    import bench
    from keras_rs_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.create_mesh()
    state, step, batch, _, _ = bench.build(
        "sharded", mesh, batch_size=2048, vocab=200_000, dim=128
    )
    txt = jax.jit(step).lower(state, batch).compile().as_text()
    n_pallas = txt.count("tpu_custom_call")
    losses = []
    for _ in range(3):
        state, loss = jax.jit(step, donate_argnums=(0,))(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0] + 0.5, losses
    print(f"[train step] PASS losses={losses} tpu_custom_call={n_pallas}")
    assert n_pallas >= 1, "Pallas update path not engaged on TPU"


if __name__ == "__main__":
    check_preprocess_parity()
    check_train_step()
    print("chip_parity_check: ALL PASS")
