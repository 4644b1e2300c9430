"""Device (jittable XLA) COO preprocessing vs the host numpy oracle.

The device path must reproduce the host path's CooBatch arrays exactly
(same stable entry order, same bucket/dedup/sink contracts) so the two
are interchangeable under the lookup kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu.layers.embedding import preprocessing
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.device_preprocessing import (
    preprocess_stack_device,
)
from keras_rs_tpu.layers.embedding.stacking import build_stacks


def _make_stack(num_shards=4, batch=32, combiners=("mean", "sum"),
                vocabs=(97, 53), dims=(8, 8), max_ids=64, max_unique=64):
    tables = [
        TableConfig(
            name=f"t{i}",
            vocabulary_size=v,
            embedding_dim=d,
            combiner=c,
            max_ids_per_partition=max_ids,
            max_unique_ids_per_partition=max_unique,
        )
        for i, (v, d, c) in enumerate(zip(vocabs, dims, combiners))
    ]
    feats = [
        FeatureConfig(
            name=f"f{i}",
            table=t,
            input_shape=(batch, 4),
            output_shape=(batch, t.embedding_dim),
        )
        for i, t in enumerate(tables)
    ]
    stacks = build_stacks(feats, num_shards)
    assert len(stacks) == 1, [s.name for s in stacks]
    return stacks[0]


def _rand_inputs(stack, seed=0, valence=4, pad_frac=0.25):
    rng = np.random.default_rng(seed)
    B = stack.batch_size
    inputs, weights = {}, {}
    for fspec in stack.features:
        vocab = stack.table_spec(fspec.table_name).vocabulary_size
        ids = rng.integers(0, vocab, (B, valence))
        w = (rng.random((B, valence)) > pad_frac).astype(np.float32)
        w *= rng.random((B, valence)).astype(np.float32) + 0.5
        inputs[fspec.name] = ids
        weights[fspec.name] = w
    return inputs, weights


@pytest.mark.parametrize("combiners", [("mean", "sum"), ("sqrtn", "mean")])
@pytest.mark.parametrize("seed", [0, 1])
def test_matches_host_oracle(combiners, seed):
    stack = _make_stack(combiners=combiners)
    inputs, weights = _rand_inputs(stack, seed=seed)

    host, hstats = preprocessing.preprocess_stack(
        stack, inputs, weights, backend="numpy"
    )
    dev, dstats = jax.jit(
        lambda i, w: preprocess_stack_device(stack, i, w)
    )(
        {k: jnp.asarray(v) for k, v in inputs.items()},
        {k: jnp.asarray(v) for k, v in weights.items()},
    )

    np.testing.assert_array_equal(dev["send_slots"], host.send_slots)
    np.testing.assert_array_equal(dev["send_segs"], host.send_segs)
    np.testing.assert_allclose(
        dev["send_gains"], host.send_gains, rtol=1e-6
    )
    np.testing.assert_array_equal(dev["unique_slots"], host.unique_slots)
    np.testing.assert_array_equal(dev["entry_unique"], host.entry_unique)
    np.testing.assert_allclose(dev["divisors"], host.divisors, rtol=1e-6)
    assert int(dstats.max_ids_per_bucket) == hstats.max_ids_per_bucket
    assert int(dstats.max_unique_per_shard) == hstats.max_unique_per_shard
    assert int(dstats.dropped_ids) == hstats.dropped_ids


def test_capacity_overflow_drops_match():
    # Tiny capacity forces drops; both paths must drop the SAME entries
    # (stable order within buckets).
    stack = _make_stack(max_ids=3, max_unique=8)
    inputs, weights = _rand_inputs(stack, seed=2)

    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        host, hstats = preprocessing.preprocess_stack(
            stack, inputs, weights, backend="numpy"
        )
    dev, dstats = preprocess_stack_device(
        stack,
        {k: jnp.asarray(v) for k, v in inputs.items()},
        {k: jnp.asarray(v) for k, v in weights.items()},
    )
    np.testing.assert_array_equal(dev["send_slots"], host.send_slots)
    np.testing.assert_array_equal(dev["unique_slots"], host.unique_slots)
    np.testing.assert_array_equal(dev["entry_unique"], host.entry_unique)
    assert int(dstats.dropped_ids) == hstats.dropped_ids > 0


def test_invalid_ids_ignored():
    stack = _make_stack()
    inputs, weights = _rand_inputs(stack, seed=3)
    # Corrupt some ids out of range; zero some weights.
    f0 = stack.features[0].name
    inputs[f0] = np.asarray(inputs[f0]).copy()
    inputs[f0][0, 0] = -7
    inputs[f0][1, 1] = 10**6
    host, _ = preprocessing.preprocess_stack(
        stack, inputs, weights, backend="numpy"
    )
    dev, _ = preprocess_stack_device(
        stack,
        {k: jnp.asarray(v) for k, v in inputs.items()},
        {k: jnp.asarray(v) for k, v in weights.items()},
    )
    np.testing.assert_array_equal(dev["send_slots"], host.send_slots)
    np.testing.assert_allclose(dev["divisors"], host.divisors, rtol=1e-6)


def test_no_weights_and_1d_inputs():
    stack = _make_stack()
    B = stack.batch_size
    rng = np.random.default_rng(4)
    inputs = {
        f.name: rng.integers(
            0, stack.table_spec(f.table_name).vocabulary_size, (B,)
        )
        for f in stack.features
    }
    host, _ = preprocessing.preprocess_stack(
        stack, inputs, None, backend="numpy"
    )
    dev, _ = preprocess_stack_device(
        stack, {k: jnp.asarray(v) for k, v in inputs.items()}, None
    )
    np.testing.assert_array_equal(dev["send_slots"], host.send_slots)
    np.testing.assert_array_equal(dev["send_segs"], host.send_segs)
    np.testing.assert_allclose(dev["divisors"], host.divisors, rtol=1e-6)


def test_single_shard_fast_path_matches_host():
    # D == 1 takes the slice-based fast path; must stay bit-exact.
    stack = _make_stack(num_shards=1, batch=24, max_ids=40, max_unique=32)
    inputs, weights = _rand_inputs(stack, seed=7)
    host, hstats = preprocessing.preprocess_stack(
        stack, inputs, weights, backend="numpy"
    )
    dev, dstats = preprocess_stack_device(
        stack,
        {k: jnp.asarray(v) for k, v in inputs.items()},
        {k: jnp.asarray(v) for k, v in weights.items()},
    )
    for k in ("send_slots", "send_segs", "unique_slots", "entry_unique"):
        np.testing.assert_array_equal(dev[k], getattr(host, k))
    np.testing.assert_allclose(dev["send_gains"], host.send_gains, rtol=1e-6)
    np.testing.assert_allclose(dev["divisors"], host.divisors, rtol=1e-6)
    assert int(dstats.max_ids_per_bucket) == hstats.max_ids_per_bucket


def test_single_shard_capacity_exceeds_entries():
    # C > total entries: the fast path pads with sink/zeros.
    stack = _make_stack(num_shards=1, batch=8, max_ids=4096, max_unique=64)
    inputs, weights = _rand_inputs(stack, seed=8)
    host, _ = preprocessing.preprocess_stack(
        stack, inputs, weights, backend="numpy"
    )
    dev, _ = preprocess_stack_device(
        stack,
        {k: jnp.asarray(v) for k, v in inputs.items()},
        {k: jnp.asarray(v) for k, v in weights.items()},
    )
    np.testing.assert_array_equal(dev["send_slots"], host.send_slots)
    np.testing.assert_allclose(dev["send_gains"], host.send_gains, rtol=1e-6)


def test_empty_shard_dedup_matches_host():
    # Regression (code review): a shard receiving ZERO ids must get the
    # host path's sink-filled unique_slots — the old per-row overflow
    # sentinel corrupted the NEXT shard's unique_slots[e+1, 0].
    stack = _make_stack(num_shards=2, batch=8, vocabs=(40, 24),
                        max_ids=32, max_unique=16)
    B = stack.batch_size
    inputs = {}
    for f in stack.features:
        t = stack.table_spec(f.table_name)
        vocab = t.vocabulary_size
        # ids with (id + rotation) % 2 == 0 -> shard 1 receives nothing
        # (rotated MOD sharding: even ids for rotation 0, odd for 1).
        ids = (np.arange(B * 4).reshape(B, 4) * 2) % (vocab - vocab % 2)
        inputs[f.name] = ids + (t.rotation % 2)
    host, _ = preprocessing.preprocess_stack(
        stack, inputs, None, backend="numpy"
    )
    dev, _ = preprocess_stack_device(
        stack, {k: jnp.asarray(v) for k, v in inputs.items()}, None
    )
    np.testing.assert_array_equal(dev["unique_slots"], host.unique_slots)
    np.testing.assert_array_equal(dev["entry_unique"], host.entry_unique)
    sink = stack.sink_slot
    # Shard 1 saw nothing: all sink.
    assert (np.asarray(dev["unique_slots"])[1] == sink).all()


@pytest.mark.parametrize("case", range(8))
def test_fuzz_three_backend_parity(case):
    """Randomized configs: the numpy host path, the C++ native path (when
    built), and the device path must produce IDENTICAL CooBatch arrays —
    random shard counts, feature counts, valences, capacities, weights,
    and out-of-range ids."""
    from keras_rs_tpu.layers.embedding import native as native_lib

    rng = np.random.default_rng(1000 + case)
    num_shards = int(rng.choice([1, 2, 4, 8]))
    n_feats = int(rng.integers(1, 4))
    batch = num_shards * int(rng.integers(2, 6))
    combiners = [
        str(rng.choice(["mean", "sum", "sqrtn"])) for _ in range(n_feats)
    ]
    vocabs = [int(rng.integers(16, 200)) for _ in range(n_feats)]
    max_ids = int(rng.integers(8, 64))
    stack = _make_stack(
        num_shards=num_shards,
        batch=batch,
        combiners=combiners,
        vocabs=vocabs,
        dims=[8] * n_feats,
        max_ids=max_ids,
        max_unique=int(rng.integers(8, 64)),
    )
    valence = int(rng.integers(1, 6))
    inputs, weights = {}, {}
    for fspec in stack.features:
        vocab = stack.table_spec(fspec.table_name).vocabulary_size
        # Include out-of-range ids (negative and >= vocab): all backends
        # must ignore them identically.
        ids = rng.integers(-3, vocab + 5, (batch, valence))
        w = (rng.random((batch, valence)) > 0.3).astype(np.float32)
        w *= rng.random((batch, valence)).astype(np.float32) + 0.25
        inputs[fspec.name] = ids
        weights[fspec.name] = w

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        host, host_stats = preprocessing.preprocess_stack(
            stack, inputs, weights, backend="numpy"
        )
        coo_dev, dev_stats = jax.jit(
            lambda: preprocess_stack_device(stack, inputs, weights)
        )()
        if native_lib.available():
            nat, nat_stats = preprocessing.preprocess_stack(
                stack, inputs, weights, backend="native"
            )
        else:
            nat, nat_stats = None, None

    for k, v in host.arrays().items():
        np.testing.assert_array_equal(
            np.asarray(coo_dev[k]), v, err_msg=f"device vs numpy: {k}"
        )
        if nat is not None:
            np.testing.assert_array_equal(
                nat.arrays()[k], v, err_msg=f"native vs numpy: {k}"
            )
    assert int(dev_stats.dropped_ids) == host_stats.dropped_ids
    assert int(dev_stats.max_ids_per_bucket) == host_stats.max_ids_per_bucket
    if nat_stats is not None:
        assert nat_stats.dropped_ids == host_stats.dropped_ids
