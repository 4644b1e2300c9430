"""Parity features: ragged inputs, has_sharded_tables, capacity growth."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu.data.ragged import Ragged
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)
from keras_rs_tpu.layers.embedding.embed_reduce import EmbedReduce
from keras_rs_tpu.parallel import mesh as mesh_lib


def test_ragged_from_lists_and_padding():
    r = Ragged.from_lists([[1, 2, 3], [], [4]])
    ids, w = r.to_padded()
    np.testing.assert_array_equal(ids, [[1, 2, 3], [0, 0, 0], [4, 0, 0]])
    np.testing.assert_array_equal(
        w, [[1, 1, 1], [0, 0, 0], [1, 0, 0]]
    )
    ids2, w2 = r.to_padded(max_length=2)  # truncation keeps first
    np.testing.assert_array_equal(ids2, [[1, 2], [0, 0], [4, 0]])


def test_embed_reduce_ragged_matches_padded():
    key = jax.random.key(0)
    layer = EmbedReduce(50, 8, key=key, combiner="mean")
    r = Ragged.from_lists([[3, 7], [9], [1, 2, 4]])
    out_ragged = layer(r)
    ids, w = r.to_padded()
    out_padded = layer(jnp.asarray(ids), jnp.asarray(w))
    np.testing.assert_allclose(out_ragged, out_padded)


def _make_layer(batch=16, max_ids=128, max_unique=128, **kwargs):
    table = TableConfig(
        name="t",
        vocabulary_size=100,
        embedding_dim=8,
        combiner="mean",
        placement="sharded",
        max_ids_per_partition=max_ids,
        max_unique_ids_per_partition=max_unique,
    )
    fc = FeatureConfig(
        name="f",
        table=table,
        input_shape=(batch, 4),
        output_shape=(batch, 8),
    )
    mesh = mesh_lib.create_mesh()
    return DistributedEmbedding(
        {"f": fc}, key=jax.random.key(0), mesh=mesh, **kwargs
    )


def test_ragged_through_distributed_embedding():
    layer = _make_layer()
    B = 16
    rows = [[int(i % 100)] * ((i % 3) + 1) for i in range(B)]
    r = Ragged.from_lists(rows)
    acts_ragged = layer({"f": r})["f"]
    ids, w = r.to_padded()
    acts_padded = layer({"f": ids}, {"f": w})["f"]
    np.testing.assert_allclose(
        np.asarray(acts_ragged), np.asarray(acts_padded), rtol=1e-6
    )


def test_has_sharded_tables():
    layer = _make_layer()
    assert layer.has_sharded_tables()
    # default_device-only layer
    t = TableConfig(name="d", vocabulary_size=10, embedding_dim=4,
                    placement="default_device")
    fc = FeatureConfig(name="g", table=t, input_shape=(8,),
                       output_shape=(8, 4))
    dense_only = DistributedEmbedding(
        {"g": fc}, key=jax.random.key(1), mesh=mesh_lib.create_mesh()
    )
    assert not dense_only.has_sharded_tables()


def test_update_stats_and_rebuild_capacities():
    # Tiny capacities -> drops -> update_stats warns -> rebuild grows.
    layer = _make_layer(max_ids=2, max_unique=8, auto_grow=False)
    # Skewed ids: many entries land in one (src, dst) bucket and blow
    # past the capacity of 2.
    ids = np.full((16, 4), 7, np.int64)
    ids[:, 1] = np.arange(16) % 5
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        layer.preprocess({"f": ids}, training=True)
    stats = layer.input_stats
    assert stats  # recorded

    stack = layer.stacks[0]
    old_C = stack.max_ids_per_partition
    with pytest.warns(UserWarning, match="exceed capacities"):
        layer.update_stats()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        changed = layer.rebuild_capacities()
    assert changed
    new_stack = layer.stacks[0]
    assert new_stack.max_ids_per_partition > old_C
    # And preprocessing now fits without drops.
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any drop warning -> failure
        pre = layer.preprocess({"f": ids}, training=False)
    acts = layer(pre)["f"]
    assert np.isfinite(np.asarray(acts)).all()


def test_ragged_weights_with_ragged_ids():
    # Regression (code review): Ragged weights used to crash/mis-broadcast.
    key = jax.random.key(3)
    layer = EmbedReduce(50, 8, key=key, combiner="mean")
    r = Ragged.from_lists([[3, 7], [9], [1, 2, 4]])
    w = Ragged(
        values=np.asarray([0.5, 1.5, 2.0, 1.0, 1.0, 3.0], np.float32),
        row_lengths=r.row_lengths,
    )
    out = layer(r, weights=w)
    ids, mask = r.to_padded()
    wv, _ = w.to_padded(max_length=ids.shape[1])
    want = layer(jnp.asarray(ids), jnp.asarray(mask * wv))
    np.testing.assert_allclose(out, want)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="Ragged weights"):
        layer(jnp.asarray(ids), weights=w)


def test_ragged_to_padded_static_max_length():
    r = Ragged.from_lists([[1], [2, 3]])
    ids, w = r.to_padded(max_length=5)
    assert ids.shape == (2, 5)  # pads UP to the static width
    np.testing.assert_array_equal(w.sum(axis=1), [1, 2])


def test_bucketize_boundary_goes_to_upper_bucket():
    from keras_rs_tpu.data.feature_engineering import bucketize

    np.testing.assert_array_equal(
        bucketize([9.9, 10.0, 49.9, 50.0], [10, 50]), [0, 1, 1, 2]
    )


def test_ragged_weights_row_length_mismatch_raises():
    key = jax.random.key(4)
    layer = EmbedReduce(50, 8, key=key)
    r = Ragged.from_lists([[3, 7], [9]])
    bad_w = Ragged(
        values=np.asarray([1.0], np.float32),
        row_lengths=np.asarray([1, 0], np.int32),
    )
    with pytest.raises(ValueError, match="row_lengths"):
        layer(r, weights=bad_w)


def test_ragged_from_lists_preserves_float_weights():
    w = Ragged.from_lists([[0.5, 1.5], [2.0]])
    assert w.values.dtype == np.float32
    np.testing.assert_allclose(w.values, [0.5, 1.5, 2.0])
