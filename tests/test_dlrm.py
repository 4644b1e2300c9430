"""DLRM-DCNv2 end-to-end on the 8-device mesh: hybrid data-parallel dense +
model-parallel sharded embeddings in one jitted train step."""

import jax
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.data import synthetic
from keras_rs_tpu.models.dlrm import DLRMConfig, DLRMDCNv2, bce_loss
from keras_rs_tpu.parallel import mesh as mesh_lib

B = 64


def make_model(seed=0):
    cfg = DLRMConfig(
        vocab_sizes=[5000, 100, 3000, 50],
        multi_hot_sizes=[3, 1, 1, 2],
        num_dense_features=13,
        embedding_dim=16,
        bottom_mlp=(32, 16),
        top_mlp=(64, 16, 1),
        num_dcn_layers=2,
        dcn_projection_dim=8,
        embedding_threshold=1000,
        max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
        learning_rate=0.01,
        global_batch_size=B,
        table_placement="sharded",
    )
    mesh = mesh_lib.create_mesh()
    model = DLRMDCNv2(cfg, key=jax.random.key(seed), mesh=mesh)
    return model, cfg, mesh


def make_batch(cfg, mesh, seed=0):
    raw = synthetic.criteo_like_batch(
        B,
        vocab_sizes=cfg.vocab_sizes,
        multi_hot_sizes=cfg.multi_hot_sizes,
        seed=seed,
    )
    return raw


def test_dlrm_splits_large_small():
    model, cfg, _ = make_model()
    assert model.large_idx == [0, 2]
    assert model.small_idx == [1, 3]
    assert model.embedding_layer is not None
    assert set(model.small_embeddings) == {"cat_1", "cat_3"}


def test_dlrm_forward_shape():
    model, cfg, mesh = make_model()
    batch = make_batch(cfg, mesh)
    pre = model.preprocess(batch)
    pre = {
        k: (mesh_lib.put_batch(mesh, v) if k in ("dense", "label",
                                                 "cat_1", "cat_3")
            else v)
        for k, v in pre.items()
    }
    logits = jax.jit(lambda m, b: m(b))(model, pre)
    assert logits.shape == (B,)
    assert np.isfinite(np.asarray(logits)).all()


def test_dlrm_trains_and_loss_decreases():
    model, cfg, mesh = make_model()

    state = training.create_train_state(model, optax.adagrad(0.01))
    step = training.make_train_step(bce_loss, optax.adagrad(0.01),
                                    donate=False)

    losses = []
    for i in range(8):
        batch = make_batch(cfg, mesh, seed=i % 2)  # two repeating batches
        pre = state.model.preprocess(batch, training=True)
        state, loss = step(state, pre)
        losses.append(float(loss))
    # Memorizing two alternating batches: per-batch loss must drop.
    assert losses[-2] < losses[0], losses
    assert losses[-1] < losses[1], losses
    # Embedding step counter advanced once per step.
    emb = state.model.embedding_layer
    for stack in emb.stacks:
        assert float(emb.state.value[stack.name]["step"]) == 8.0
    # Stats observed.
    assert emb.input_stats


def test_dlrm_embedding_optimizer_knob():
    """DLRMConfig.embedding_optimizer selects the fused-table optimizer
    (capacity mode pairs rowwise_adagrad with bf16 tables: the slot is a
    1-D f32 scalar per row instead of a full [rows, dim] buffer)."""
    cfg = DLRMConfig(
        vocab_sizes=[5000, 100, 3000, 50],
        multi_hot_sizes=[3, 1, 1, 2],
        num_dense_features=13,
        embedding_dim=16,
        bottom_mlp=(32, 16),
        top_mlp=(64, 16, 1),
        num_dcn_layers=2,
        dcn_projection_dim=8,
        embedding_threshold=1000,
        max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
        global_batch_size=B,
        table_placement="sharded",
        table_dtype="bfloat16",
        embedding_optimizer="rowwise_adagrad",
    )
    mesh = mesh_lib.create_mesh()
    model = DLRMDCNv2(cfg, key=jax.random.key(0), mesh=mesh)
    emb = model.embedding_layer
    for stack in emb.stacks:
        st = emb.state.value[stack.name]
        assert st["table"].dtype == jax.numpy.bfloat16
        acc = st["slots"]["accumulator"]
        assert acc.ndim == 1 and acc.dtype == jax.numpy.float32

    state = training.create_train_state(model, optax.adagrad(0.01))
    step = training.make_train_step(bce_loss, optax.adagrad(0.01),
                                    donate=False)
    losses = []
    for i in range(6):
        pre = state.model.preprocess(make_batch(cfg, mesh), training=True)
        state, loss = step(state, pre)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
