"""bf16-resident dense stack (`output_dtype` / `dense_output_dtype`).

The mixed-precision mode keeps dense ACTIVATIONS in bfloat16 between
matmul fusions while parameters and MXU accumulation stay f32 — the
variant tools/probe_dense_mfu.py A/Bs on chip. These tests pin the
dtype contract and that training numerics stay close to the f32 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.data import synthetic
from keras_rs_tpu.layers.dense import MLP, Dense
from keras_rs_tpu.layers.feature_interaction.feature_cross import (
    FeatureCross,
)
from keras_rs_tpu.models.dlrm import DLRMConfig, DLRMDCNv2, bce_loss

B = 64


def test_dense_output_dtype():
    d = Dense(
        8, 4, key=jax.random.key(0),
        compute_dtype="bfloat16", output_dtype="bfloat16",
    )
    y = d(jnp.ones((2, 8)))
    assert y.dtype == jnp.bfloat16
    # Params stay f32.
    assert d.kernel.dtype == jnp.float32


def test_mlp_hidden_bf16_final_f32():
    mlp = MLP(
        8, (16, 16, 4), key=jax.random.key(0),
        compute_dtype="bfloat16", output_dtype="bfloat16",
    )
    x = jnp.ones((2, 8))
    h = mlp.layers[0](x)
    assert h.dtype == jnp.bfloat16
    # The stack's final output stays in param dtype.
    assert mlp(x).dtype == jnp.float32


def test_feature_cross_keeps_bf16_residual():
    fc = FeatureCross(
        16, key=jax.random.key(0), projection_dim=8,
        compute_dtype="bfloat16", output_dtype="bfloat16",
    )
    x0 = jnp.ones((4, 16), jnp.bfloat16)
    out = fc(x0, x0)
    assert out.dtype == jnp.bfloat16


def _train_losses(dense_output_dtype, steps=5):
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
        table_placement="default_device",
        dense_output_dtype=dense_output_dtype,
    )
    model = DLRMDCNv2(cfg, key=jax.random.key(0))
    raw = synthetic.criteo_like_batch(
        B,
        vocab_sizes=cfg.vocab_sizes,
        multi_hot_sizes=cfg.multi_hot_sizes,
        seed=0,
    )
    opt = optax.adagrad(cfg.learning_rate)
    state = training.create_train_state(model, opt)
    step = training.make_train_step(
        lambda m, b: bce_loss(m, m.preprocess_on_device(b)), opt
    )
    losses = []
    for _ in range(steps):
        state, loss = step(state, raw)
        losses.append(float(loss))
    return losses


def test_dlrm_bf16_resident_trains_close_to_f32():
    f32 = _train_losses(None)
    bf16 = _train_losses("bfloat16")
    assert all(np.isfinite(bf16))
    # Loss trajectories agree to bf16 rounding (not bit-exact).
    np.testing.assert_allclose(bf16, f32, rtol=0.05, atol=0.01)


def test_dlrm_bf16_resident_logits_dtype():
    cfg = DLRMConfig(
        vocab_sizes=[100, 50],
        multi_hot_sizes=[1, 1],
        num_dense_features=4,
        embedding_dim=8,
        bottom_mlp=(8, 8),
        top_mlp=(8, 1),
        num_dcn_layers=1,
        dcn_projection_dim=4,
        embedding_threshold=1000,
        global_batch_size=8,
        table_placement="default_device",
        dense_output_dtype="bfloat16",
    )
    model = DLRMDCNv2(cfg, key=jax.random.key(0))
    raw = synthetic.criteo_like_batch(
        8, num_dense=4, vocab_sizes=cfg.vocab_sizes,
        multi_hot_sizes=cfg.multi_hot_sizes, seed=0,
    )
    logits = model(model.preprocess(raw))
    # Final Dense keeps param dtype: the loss sees f32 logits.
    assert logits.dtype == jnp.float32
    assert logits.shape == (8,)
