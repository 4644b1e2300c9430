"""serving_copy(): mesh-sharded slot-free inference twin.

Complements freeze() (which collects tables onto one device): the copy
keeps tables sharded over the mesh, drops optimizer slots shard-locally
(packed [R, stride, dim] state sliced to its table plane), and serves
identical activations through the normal preprocess + __call__ path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)


def _state_bytes(layer):
    return sum(
        x.nbytes
        for x in jax.tree_util.tree_leaves(layer.state)
        if hasattr(x, "nbytes")
    )


def _serve(layer, inputs):
    pre = layer.preprocess(inputs)
    return jax.jit(lambda l, p: l(p))(layer, pre)


def test_serving_copy_matches_and_drops_slots():
    B = 16
    t = TableConfig(
        "t", 256, 16, optimizer="adagrad", combiner="mean",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    t2 = TableConfig(
        "t2", 128, 16, optimizer="adam", combiner="sum",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    fcs = {
        "f": FeatureConfig("f", t, (B, 3), (B, 16)),
        "g": FeatureConfig("g", t2, (B, 2), (B, 16)),
    }
    layer = DistributedEmbedding(fcs, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    inputs = {
        "f": rng.integers(0, 256, size=(B, 3)),
        "g": rng.integers(0, 128, size=(B, 2)),
    }
    want = _serve(layer, inputs)

    copy = layer.serving_copy()
    got = _serve(copy, inputs)
    for k in inputs:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6
        )

    # Slot-free: adagrad carries 1 slot, adam 2 — the copy keeps only
    # table bytes (plus scalar step counters).
    old_bytes = _state_bytes(layer)
    new_bytes = _state_bytes(copy)
    table_bytes = sum(
        v.nbytes for v in layer.get_embedding_tables().values()
    )
    assert new_bytes < old_bytes / 2
    # Stacked tables round rows up (shard padding + sink row): the copy
    # is within a small margin of the logical table bytes.
    assert new_bytes <= table_bytes * 1.3 + 64

    # Tables stay sharded over the mesh (no single-device collect).
    for name, st in copy.state.value.items():
        shard_axes = {
            d
            for d, n in enumerate(st["table"].sharding.spec)
            if n is not None
        }
        assert 0 in shard_axes, (name, st["table"].sharding)


def test_serving_copy_preserves_bf16_and_shared_tables():
    B = 8
    t = TableConfig(
        "t", 128, 64, optimizer="adagrad", combiner="mean",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64, dtype="bfloat16",
    )
    fcs = {
        "f": FeatureConfig("f", t, (B, 2), (B, 64)),
        "h": FeatureConfig("h", t, (B, 1), (B, 64)),
    }
    layer = DistributedEmbedding(fcs, key=jax.random.key(1))
    rng = np.random.default_rng(1)
    inputs = {
        "f": rng.integers(0, 128, size=(B, 2)),
        "h": rng.integers(0, 128, size=(B, 1)),
    }
    want = _serve(layer, inputs)
    copy = layer.serving_copy()
    got = _serve(copy, inputs)
    for k in inputs:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32),
            np.asarray(want[k], np.float32),
            rtol=1e-6,
        )
    # The (possibly bit-packed) table buffer transfers by reference —
    # same array, no copy.
    (old_stack,) = layer.stacks
    (new_stack,) = copy.stacks
    assert copy.state.value[new_stack.name]["table"] is (
        layer.state.value[old_stack.name]["table"]
    )
    assert copy.state.value[new_stack.name]["slots"] == {}


def test_serving_copy_default_device_tables_shared():
    B = 8
    t = TableConfig(
        "t", 64, 8, optimizer="adagrad", combiner="mean",
        placement="default_device",
    )
    fc = FeatureConfig("f", t, (B, 2), (B, 8))
    layer = DistributedEmbedding([fc], key=jax.random.key(2))
    copy = layer.serving_copy()
    assert copy.dense_tables["t"] is layer.dense_tables["t"]
    inputs = {"f": np.arange(B * 2).reshape(B, 2) % 64}
    np.testing.assert_array_equal(
        np.asarray(_serve(copy, inputs)[0]),
        np.asarray(_serve(layer, inputs)[0]),
    )
