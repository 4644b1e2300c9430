"""Bit-for-bit parity: native C++ COO preprocessing vs the numpy oracle."""

import numpy as np
import pytest

from keras_rs_tpu.layers.embedding import native
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.preprocessing import preprocess_stack
from keras_rs_tpu.layers.embedding.stacking import build_stacks

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)

B = 32
D = 8


def make_stack(combiners=("mean", "sum", "sqrtn"), C=16, U=16):
    tables = [
        TableConfig(
            f"t{i}", 40 + 13 * i, 8, optimizer="sgd", combiner=c,
            max_ids_per_partition=C, max_unique_ids_per_partition=U,
        )
        for i, c in enumerate(combiners)
    ]
    fcs = []
    for i, t in enumerate(tables):
        fcs.append(
            FeatureConfig(f"f{i}", t, (B, i + 1), (B, 8))
        )
    # A second feature sharing table 0.
    fcs.append(FeatureConfig("f_shared", tables[0], (B,), (B, 8)))
    (stack,) = build_stacks(fcs, D, stacking=[[t.name for t in tables]])
    return stack


def make_inputs(stack, seed, with_weights=True, invalid_frac=0.1):
    rng = np.random.default_rng(seed)
    inputs, weights = {}, {}
    for f in stack.features:
        vocab = stack.table_spec(f.table_name).vocabulary_size
        ids = rng.integers(-2, vocab + 3, size=(B, f.valence))
        inputs[f.name] = ids
        if with_weights:
            w = rng.random((B, f.valence)).astype(np.float32)
            w[rng.random(w.shape) < 0.2] = 0.0
            weights[f.name] = w
    return inputs, (weights if with_weights else None)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("with_weights", [True, False])
def test_native_matches_numpy(seed, with_weights):
    stack = make_stack()
    inputs, weights = make_inputs(stack, seed, with_weights)
    coo_np, stats_np = preprocess_stack(
        stack, inputs, weights, backend="numpy"
    )
    coo_nat, stats_nat = preprocess_stack(
        stack, inputs, weights, backend="native"
    )
    for name, a in coo_np.arrays().items():
        b = coo_nat.arrays()[name]
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert stats_np == stats_nat


def test_native_matches_numpy_with_drops():
    stack = make_stack(C=2, U=4)
    inputs, weights = make_inputs(stack, 5)
    with pytest.warns(UserWarning):
        coo_np, stats_np = preprocess_stack(
            stack, inputs, weights, backend="numpy"
        )
    with pytest.warns(UserWarning):
        coo_nat, stats_nat = preprocess_stack(
            stack, inputs, weights, backend="native"
        )
    for name, a in coo_np.arrays().items():
        np.testing.assert_array_equal(
            a, coo_nat.arrays()[name], err_msg=name
        )
    assert stats_np.dropped_ids == stats_nat.dropped_ids
    assert stats_np.max_ids_per_bucket == stats_nat.max_ids_per_bucket


def test_native_is_faster():
    import time

    t = TableConfig(
        "big", 1_000_000, 8, optimizer="sgd", combiner="sum",
        max_ids_per_partition=4096, max_unique_ids_per_partition=4096,
    )
    BB = 4096
    fcs = [FeatureConfig("f", t, (BB, 4), (BB, 8))]
    (stack,) = build_stacks(fcs, D)
    rng = np.random.default_rng(0)
    inputs = {"f": rng.integers(0, 1_000_000, size=(BB, 4))}

    for backend in ("numpy", "native"):
        preprocess_stack(stack, inputs, backend=backend)  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        preprocess_stack(stack, inputs, backend="numpy")
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        preprocess_stack(stack, inputs, backend="native")
    t_nat = time.perf_counter() - t0
    print(f"numpy {t_np:.3f}s native {t_nat:.3f}s "
          f"({t_np / t_nat:.1f}x)")
    assert t_nat < t_np
