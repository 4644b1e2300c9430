"""Integration tests for the DistributedEmbedding layer: mixed placement,
nested structures, shared tables, training through the standard train step
(model-parallel tables + data-parallel dense in ONE jitted step), table
import/export, serialization."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from keras_rs_tpu import training
from keras_rs_tpu.core.module import Module
from keras_rs_tpu.layers.dense import Dense
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)
from keras_rs_tpu.parallel import mesh as mesh_lib

B = 16


def make_layer(placement="sharded", key=0):
    t_movie = TableConfig(
        "movie", 50, 8, optimizer="adagrad", combiner="mean",
        placement=placement, max_ids_per_partition=16,
        max_unique_ids_per_partition=16,
    )
    t_user = TableConfig(
        "user", 30, 8, optimizer="adagrad", combiner="sum",
        placement=placement, max_ids_per_partition=16,
        max_unique_ids_per_partition=16,
    )
    fcs = {
        "movie": FeatureConfig("movie", t_movie, (B, 3), (B, 8)),
        "movie_again": FeatureConfig(
            "movie_again", t_movie, (B,), (B, 8)
        ),
        "user": FeatureConfig("user", t_user, (B, 2), (B, 8)),
    }
    return DistributedEmbedding(fcs, key=jax.random.key(key))


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    inputs = {
        "movie": rng.integers(0, 50, size=(B, 3)),
        "movie_again": rng.integers(0, 50, size=(B,)),
        "user": rng.integers(0, 30, size=(B, 2)),
    }
    return inputs


def oracle(layer, inputs):
    tables = layer.get_embedding_tables()
    out = {}
    for fc in layer._feature_leaves:
        ids = np.asarray(inputs[fc.name])
        if ids.ndim == 1:
            ids = ids[:, None]
        emb = tables[fc.table.name][ids]
        if fc.table.combiner == "mean":
            out[fc.name] = emb.mean(axis=1)
        else:
            out[fc.name] = emb.sum(axis=1)
    return out


@pytest.mark.parametrize("placement", ["sharded", "default_device"])
def test_forward_matches_oracle(placement):
    layer = make_layer(placement)
    inputs = make_inputs()
    pre = layer.preprocess(inputs)

    @jax.jit
    def fwd(layer, pre):
        return layer(pre)

    acts = fwd(layer, pre)
    expected = oracle(layer, inputs)
    for name in expected:
        np.testing.assert_allclose(
            np.asarray(acts[name]), expected[name], rtol=1e-5, atol=1e-5,
            err_msg=name,
        )


def test_shared_table_is_shared():
    layer = make_layer("sharded")
    # movie + movie_again share one table: only 2 tables total.
    tables = layer.get_embedding_tables()
    assert set(tables) == {"movie", "user"}


def test_raw_input_call_outside_jit():
    layer = make_layer("sharded")
    inputs = make_inputs()
    acts = layer(inputs)
    expected = oracle(layer, inputs)
    np.testing.assert_allclose(
        np.asarray(acts["movie"]), expected["movie"], rtol=1e-5, atol=1e-5
    )


def test_set_get_embedding_tables_roundtrip():
    layer = make_layer("sharded")
    rng = np.random.default_rng(3)
    new_tables = {
        "movie": rng.normal(size=(50, 8)).astype(np.float32),
        "user": rng.normal(size=(30, 8)).astype(np.float32),
    }
    layer.set_embedding_tables(new_tables)
    got = layer.get_embedding_tables()
    np.testing.assert_allclose(got["movie"], new_tables["movie"], rtol=1e-6)
    np.testing.assert_allclose(got["user"], new_tables["user"], rtol=1e-6)


class TinyModel(Module):
    """Dense model on top of DistributedEmbedding (DLRM-shaped)."""

    def __init__(self, emb: DistributedEmbedding, key):
        self.emb = emb
        self.head = Dense(24, 1, key=key)

    def __call__(self, pre):
        acts = self.emb(pre)
        x = jnp.concatenate(
            [acts["movie"], acts["movie_again"], acts["user"]], axis=-1
        )
        return self.head(x)[..., 0]


def test_train_step_updates_tables_and_dense():
    layer = make_layer("sharded")
    model = TinyModel(layer, key=jax.random.key(9))
    inputs = make_inputs()
    labels = np.random.default_rng(1).normal(size=(B,)).astype(np.float32)

    def loss_fn(model, batch):
        pre, y = batch
        pred = model(pre)
        return jnp.mean((pred - y) ** 2)

    state = training.create_train_state(model, optax.sgd(0.1))
    step = training.make_train_step(loss_fn, optax.sgd(0.1), donate=False)

    tables_before = layer.get_embedding_tables()
    head_before = np.asarray(model.head.kernel)
    pre = layer.preprocess(inputs, training=True)
    state, loss1 = step(state, (pre, jnp.asarray(labels)))
    state, loss2 = step(state, (pre, jnp.asarray(labels)))

    # Loss decreases over the two steps.
    assert float(loss2) < float(loss1)
    new_model = state.model
    # Embedding tables changed via the fused in-kernel optimizer.
    tables_after = new_model.emb.get_embedding_tables()
    assert not np.allclose(tables_after["movie"], tables_before["movie"])
    # Step counter advanced by 2.
    for stack in new_model.emb.stacks:
        np.testing.assert_allclose(
            float(new_model.emb.state.value[stack.name]["step"]), 2.0
        )
    # Dense head updated by optax.
    assert not np.allclose(np.asarray(new_model.head.kernel), head_before)
    # Stats recorded.
    assert new_model.emb.input_stats or layer.input_stats


def test_serialization_roundtrip():
    layer = make_layer("sharded")
    config = layer.get_config()
    restored = DistributedEmbedding.from_config(config)
    assert {t.name for s in restored.stacks for t in s.tables} == {
        t.name for s in layer.stacks for t in s.tables
    }
    # Shared table stays shared after round trip.
    movie_fcs = [
        fc for fc in restored._feature_leaves
        if fc.table.name == "movie"
    ]
    assert len(movie_fcs) == 2
    assert movie_fcs[0].table is movie_fcs[1].table


def test_auto_placement_uses_mesh():
    t = TableConfig("t", 10, 8, placement="auto")
    fc = FeatureConfig("f", t, (B,), (B, 8))
    layer = DistributedEmbedding([fc], key=jax.random.key(0))
    # 8 virtual devices -> auto resolves to sharded.
    assert len(layer.stacks) == 1
    assert not layer.dense_tables


def test_mixed_placement():
    t1 = TableConfig(
        "big", 64, 8, placement="sharded", optimizer="sgd",
        max_ids_per_partition=8, max_unique_ids_per_partition=8,
    )
    t2 = TableConfig("small", 10, 8, placement="default_device")
    fcs = [
        FeatureConfig("big_f", t1, (B,), (B, 8)),
        FeatureConfig("small_f", t2, (B,), (B, 8)),
    ]
    layer = DistributedEmbedding(fcs, key=jax.random.key(0))
    assert len(layer.stacks) == 1 and len(layer.dense_tables) == 1
    inputs = [
        np.arange(B) % 64,
        np.arange(B) % 10,
    ]
    pre = layer.preprocess(inputs)
    acts = jax.jit(lambda l, p: l(p))(layer, pre)
    tables = layer.get_embedding_tables()
    np.testing.assert_allclose(
        np.asarray(acts[0]), tables["big"][np.arange(B) % 64],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(acts[1]), tables["small"][np.arange(B) % 10],
        rtol=1e-5, atol=1e-5,
    )


def test_mixed_layout_stacks_train_together():
    """One layer holding a PACKED stack (dim 128, adagrad) and a SPLIT
    stack (dim 16, adam — different dim AND optimizer, so auto-stacking
    keeps them apart) must train both correctly in one jitted step."""
    import optax

    from keras_rs_tpu import training

    t_wide = TableConfig(
        "wide", 256, 128, optimizer="adagrad", combiner="sum",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    t_narrow = TableConfig(
        "narrow", 64, 16, optimizer="adam", combiner="mean",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    fcs = {
        "w": FeatureConfig("w", t_wide, (B, 2), (B, 128)),
        "n": FeatureConfig("n", t_narrow, (B, 3), (B, 16)),
    }
    layer = DistributedEmbedding(fcs, key=jax.random.key(0))
    layouts = sorted(s.packed_state for s in layer.stacks)
    assert layouts == [False, True], layouts  # one of each

    rng = np.random.default_rng(0)
    ids = {
        "w": rng.integers(0, 256, size=(B, 2)),
        "n": rng.integers(0, 64, size=(B, 3)),
    }
    pre = layer.preprocess(ids)
    tables_before = layer.get_embedding_tables()

    def loss_fn(model, batch):
        acts = model(batch)
        return jnp.mean(acts["w"] ** 2) + jnp.mean(acts["n"] ** 2)

    state = training.create_train_state(layer, optax.sgd(0.1))
    step = training.make_train_step(
        loss_fn, optax.sgd(0.1), donate=False
    )
    state, l1 = step(state, pre)
    state, l2 = step(state, pre)
    assert float(l2) < float(l1)
    after = state.model.get_embedding_tables()
    for name in ("wide", "narrow"):
        assert not np.allclose(after[name], tables_before[name]), name
    # Step counters advanced independently per stack.
    for stack in state.model.stacks:
        np.testing.assert_allclose(
            float(state.model.state.value[stack.name]["step"]), 2.0
        )
