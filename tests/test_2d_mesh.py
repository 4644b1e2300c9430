"""2-D (model x data) mesh coverage for the sharded embedding engine.

Parity with the reference's 2-D sharding exploration
(keras_rs/src/layers/embedding/jax/embedding_lookup_test.py:216-310):
tables and samples shard over the flattened product of BOTH mesh axes;
the lookup's collectives run over the axis tuple. Results must be
identical to the same model on a 1-D mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from keras_rs_tpu import training
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)
from keras_rs_tpu.parallel import mesh as mesh_lib


def _configs(batch):
    table = TableConfig(
        name="t",
        vocabulary_size=97,
        embedding_dim=8,
        combiner="mean",
        placement="sharded",
        optimizer="adagrad",
        max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    return {
        "f": FeatureConfig(
            name="f",
            table=table,
            input_shape=(batch, 3),
            output_shape=(batch, 8),
        )
    }


@pytest.mark.parametrize("shape,axes", [((2, 4), ("model", "data")),
                                        ((4, 2), ("model", "data"))])
def test_2d_mesh_matches_1d(shape, axes):
    B = 32
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (B, 3))

    mesh1 = mesh_lib.create_mesh()
    layer1 = DistributedEmbedding(
        _configs(B), key=jax.random.key(0), mesh=mesh1
    )
    acts1 = np.asarray(layer1({"f": ids})["f"])

    mesh2 = mesh_lib.create_mesh(axis_name=axes, axis_sizes=shape)
    layer2 = DistributedEmbedding(
        _configs(B), key=jax.random.key(0), mesh=mesh2, axis_name=axes
    )
    assert layer2.stacks[0].num_shards == 8
    acts2 = np.asarray(layer2({"f": ids})["f"])
    np.testing.assert_allclose(acts1, acts2, rtol=1e-5, atol=1e-6)


def test_2d_mesh_train_step():
    B = 32
    axes = ("model", "data")
    mesh = mesh_lib.create_mesh(axis_name=axes, axis_sizes=(2, 4))
    layer = DistributedEmbedding(
        _configs(B), key=jax.random.key(0), mesh=mesh, axis_name=axes
    )
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 97, (B, 3)))
    target = jnp.asarray(rng.normal(size=(B, 8)), jnp.float32)

    def loss_fn(m, batch):
        acts = m(m.preprocess_on_device({"f": batch["ids"]}))["f"]
        return jnp.mean((acts - batch["target"]) ** 2)

    opt = optax.sgd(0.1)
    state = training.create_train_state(layer, opt)
    step = training.make_train_step(loss_fn, opt, donate=False)
    losses = []
    for _ in range(5):
        state, loss = step(state, {"ids": ids, "target": target})
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    st = state.model.state.value[state.model.stacks[0].name]
    assert float(st["step"]) == 5.0


def test_2d_mesh_serialization_roundtrip():
    cfg = DistributedEmbedding(
        _configs(16),
        key=jax.random.key(0),
        mesh=mesh_lib.create_mesh(
            axis_name=("model", "data"), axis_sizes=(2, 4)
        ),
        axis_name=("model", "data"),
    ).get_config()
    assert cfg["axis_name"] == ["model", "data"]
    rebuilt = DistributedEmbedding.from_config(cfg)
    assert rebuilt.axis_name == ("model", "data")
