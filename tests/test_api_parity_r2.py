"""Round-2 API parity: regularizers, FTRL beta/l2_shrinkage, BCOO sparse
inputs, rank-3 feature shapes.

Reference anchors: feature_cross.py:103-149 (regularizers),
jax/config_conversion.py:266-283 (FTRL), embed_reduce.py:36-87 (sparse),
base_distributed_embedding.py:31-92 (higher-rank densification).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.experimental import sparse as jsparse

from keras_rs_tpu.core import regularizers as reg_lib
from keras_rs_tpu.layers.dense import MLP, Dense
from keras_rs_tpu.layers.embedding import optimizers as opt_lib
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)
from keras_rs_tpu.layers.embedding.embed_reduce import EmbedReduce
from keras_rs_tpu.layers.feature_interaction.feature_cross import (
    FeatureCross,
)


# ---------------------------------------------------------------------------
# Regularizers
# ---------------------------------------------------------------------------
class TestRegularizers:
    def test_penalty_math_matches_keras(self):
        x = jnp.asarray([[1.0, -2.0], [3.0, -4.0]])
        np.testing.assert_allclose(
            float(reg_lib.L1(0.5)(x)), 0.5 * 10.0, rtol=1e-6
        )
        np.testing.assert_allclose(
            float(reg_lib.L2(0.5)(x)), 0.5 * 30.0, rtol=1e-6
        )
        np.testing.assert_allclose(
            float(reg_lib.L1L2(0.1, 0.2)(x)), 0.1 * 10 + 0.2 * 30, rtol=1e-6
        )

    def test_get_by_name_and_serialization(self):
        assert isinstance(reg_lib.get("l2"), reg_lib.L2)
        assert reg_lib.get(None) is None
        spec = reg_lib.serialize(reg_lib.L1L2(0.3, 0.7))
        restored = reg_lib.deserialize(spec)
        assert restored == reg_lib.L1L2(0.3, 0.7)

    def test_feature_cross_regularization_loss(self):
        layer = FeatureCross(
            8,
            key=jax.random.key(0),
            kernel_regularizer=reg_lib.L2(0.01),
            bias_regularizer="l1",
        )
        expected = 0.01 * float(jnp.sum(jnp.square(layer.kernel)))
        expected += 0.01 * float(jnp.sum(jnp.abs(layer.bias)))
        got = float(reg_lib.regularization_loss(layer))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_low_rank_cross_regularizes_both_kernels(self):
        layer = FeatureCross(
            8,
            key=jax.random.key(0),
            projection_dim=4,
            use_bias=False,
            kernel_regularizer=reg_lib.L2(1.0),
        )
        expected = float(
            jnp.sum(jnp.square(layer.kernel))
            + jnp.sum(jnp.square(layer.down_proj_kernel))
        )
        np.testing.assert_allclose(
            float(reg_lib.regularization_loss(layer)), expected, rtol=1e-6
        )

    def test_walks_nested_modules_and_is_differentiable(self):
        mlp = MLP(
            4, [8, 2], key=jax.random.key(0),
            kernel_regularizer=reg_lib.L2(0.1),
        )
        expected = 0.1 * sum(
            float(jnp.sum(jnp.square(d.kernel))) for d in mlp.layers
        )
        np.testing.assert_allclose(
            float(reg_lib.regularization_loss(mlp)), expected, rtol=1e-6
        )

        # d/dW of l2*sum(W^2) = 2*l2*W — the penalty must backprop.
        def loss(m):
            return reg_lib.regularization_loss(m)

        grads = jax.grad(loss)(mlp)
        np.testing.assert_allclose(
            np.asarray(grads.layers[0].kernel),
            0.2 * np.asarray(mlp.layers[0].kernel),
            rtol=1e-5,
        )

    def test_embed_reduce_embeddings_regularizer(self):
        layer = EmbedReduce(
            10, 4, key=jax.random.key(0),
            embeddings_regularizer=reg_lib.L2(0.5),
        )
        expected = 0.5 * float(jnp.sum(jnp.square(layer.embeddings)))
        np.testing.assert_allclose(
            float(reg_lib.regularization_loss(layer)), expected, rtol=1e-6
        )

    def test_no_registration_is_zero(self):
        layer = FeatureCross(8, key=jax.random.key(0))
        assert float(reg_lib.regularization_loss(layer)) == 0.0

    def test_cross_serialization_round_trip(self):
        layer = FeatureCross(
            8, key=jax.random.key(0), kernel_regularizer=reg_lib.L2(0.3)
        )
        cfg = layer.get_config()
        restored = FeatureCross.from_config(cfg)
        assert restored.kernel_regularizer == reg_lib.L2(0.3)
        assert restored.bias_regularizer is None


# ---------------------------------------------------------------------------
# FTRL beta / l2_shrinkage
# ---------------------------------------------------------------------------
def _ftrl_oracle(w, g, acc, linear, lr, lr_power, l1, l2, l2_shr, beta):
    """Direct numpy transcription of keras/src/optimizers/ftrl.py."""
    p = -lr_power
    new_acc = acc + g * g
    sigma = (new_acc**p - acc**p) / lr
    g_lin = g + 2.0 * l2_shr * w
    new_linear = linear + g_lin - sigma * w
    # keras folds beta into l2: l2_reg = l2 + beta / (2 * lr)
    quadratic = new_acc**p / lr + 2.0 * (l2 + beta / (2.0 * lr))
    clipped = np.clip(new_linear, -l1, l1)
    new_w = (clipped - new_linear) / quadratic
    return new_w, new_acc, new_linear


class TestFTRL:
    @pytest.mark.parametrize(
        "l1,l2,l2_shr,beta",
        [
            (0.0, 0.0, 0.0, 0.0),
            (0.01, 0.1, 0.0, 0.0),
            (0.0, 0.0, 0.0, 1.5),      # beta only
            (0.0, 0.0, 0.05, 0.0),     # shrinkage only
            (0.02, 0.1, 0.05, 2.0),    # everything
        ],
    )
    def test_matches_keras_formula(self, l1, l2, l2_shr, beta):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(4, 8)).astype(np.float32)
        g = rng.normal(size=(4, 8)).astype(np.float32)
        opt = opt_lib.FTRL(
            learning_rate=0.05,
            l1_regularization_strength=l1,
            l2_regularization_strength=l2,
            l2_shrinkage_regularization_strength=l2_shr,
            beta=beta,
        )
        acc = np.asarray(opt.init_slot("accumulator", (4, 8)))
        linear = np.asarray(opt.init_slot("linear", (4, 8)))
        new_w, slots = opt.apply(
            jnp.asarray(w), jnp.asarray(g),
            {"accumulator": jnp.asarray(acc), "linear": jnp.asarray(linear)},
            jnp.zeros(()),
        )
        exp_w, exp_acc, exp_lin = _ftrl_oracle(
            w, g, acc, linear, 0.05, -0.5, l1, l2, l2_shr, beta
        )
        np.testing.assert_allclose(np.asarray(new_w), exp_w, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(slots["accumulator"]), exp_acc, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(slots["linear"]), exp_lin, rtol=1e-5
        )

    def test_config_round_trip(self):
        opt = opt_lib.FTRL(
            beta=1.0, l2_shrinkage_regularization_strength=0.1
        )
        restored = opt_lib.deserialize(opt_lib.serialize(opt))
        assert restored.beta == 1.0
        assert restored.l2_shrinkage == pytest.approx(0.1)


# ---------------------------------------------------------------------------
# BCOO sparse inputs
# ---------------------------------------------------------------------------
def _make_bcoo(ids_padded, mask):
    rows, cols = np.nonzero(mask)
    data = jnp.asarray(ids_padded[rows, cols])
    indices = jnp.asarray(np.stack([rows, cols], axis=1))
    return jsparse.BCOO((data, indices), shape=ids_padded.shape)


class TestSparseInputs:
    def test_embed_reduce_bcoo_equals_padded_weights(self):
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 10, size=(6, 4))
        mask = (rng.random((6, 4)) < 0.6).astype(np.float32)
        mask[:, 0] = 1.0  # no empty rows
        sp = _make_bcoo(ids, mask)
        for combiner in ("mean", "sum", "sqrtn"):
            layer = EmbedReduce(
                10, 8, key=jax.random.key(1), combiner=combiner
            )
            dense_out = layer(ids * mask.astype(np.int64), mask)
            sparse_out = layer(sp)
            np.testing.assert_allclose(
                np.asarray(sparse_out), np.asarray(dense_out),
                rtol=1e-5, atol=1e-6,
            )

    def test_distributed_embedding_accepts_bcoo(self):
        t = TableConfig(
            "t", 50, 8, optimizer="sgd", combiner="sum",
            placement="sharded", max_ids_per_partition=64,
            max_unique_ids_per_partition=64,
        )
        fc = FeatureConfig("f", t, (16, 4), (16, 8))
        layer = DistributedEmbedding([fc], key=jax.random.key(0))
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 50, size=(16, 4))
        mask = (rng.random((16, 4)) < 0.7).astype(np.float32)
        mask[:, 0] = 1.0
        sp = _make_bcoo(ids, mask)

        pre_sparse = layer.preprocess({"f": sp})
        pre_dense = layer.preprocess(
            {"f": ids * mask.astype(np.int64)}, {"f": mask}
        )
        a = jax.jit(lambda l, p: l(p))(layer, pre_sparse)
        b = jax.jit(lambda l, p: l(p))(layer, pre_dense)
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), rtol=1e-5, atol=1e-6
        )


# ---------------------------------------------------------------------------
# Rank-3 feature shapes
# ---------------------------------------------------------------------------
class TestRank3Features:
    B, S, L, DIM = 8, 2, 3, 8

    def _oracle(self, table, ids, combiner="mean"):
        # [B, S, L] ids -> [B, S, dim] mean of rows.
        out = table[ids]  # [B, S, L, dim]
        if combiner == "mean":
            return out.mean(axis=-2)
        return out.sum(axis=-2)

    @pytest.mark.parametrize("placement", ["sharded", "default_device"])
    def test_rank3_reduced(self, placement):
        B, S, L, DIM = self.B, self.S, self.L, self.DIM
        t = TableConfig(
            "t", 48, DIM, optimizer="sgd", combiner="mean",
            placement=placement, max_ids_per_partition=64,
            max_unique_ids_per_partition=64,
        )
        fc = FeatureConfig("f", t, (B, S, L), (B, S, DIM))
        assert fc.reduced and fc.batch_size == B * S and fc.valence == L
        layer = DistributedEmbedding([fc], key=jax.random.key(0))
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 48, size=(B, S, L))
        pre = layer.preprocess({"f": ids})
        acts = jax.jit(lambda l, p: l(p))(layer, pre)[0]
        assert acts.shape == (B, S, DIM)
        table = layer.get_embedding_tables()["t"]
        np.testing.assert_allclose(
            np.asarray(acts), self._oracle(table, ids), rtol=1e-5,
            atol=1e-6,
        )

    def test_rank2_unreduced(self):
        # (B, S) ids -> (B, S, dim): one embedding per position.
        B, S, DIM = self.B, self.S, self.DIM
        t = TableConfig(
            "t", 48, DIM, optimizer="sgd", combiner="sum",
            placement="sharded", max_ids_per_partition=64,
            max_unique_ids_per_partition=64,
        )
        fc = FeatureConfig("f", t, (B, S), (B, S, DIM))
        assert not fc.reduced and fc.batch_size == B * S
        layer = DistributedEmbedding([fc], key=jax.random.key(0))
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 48, size=(B, S))
        pre = layer.preprocess({"f": ids})
        acts = jax.jit(lambda l, p: l(p))(layer, pre)[0]
        assert acts.shape == (B, S, DIM)
        table = layer.get_embedding_tables()["t"]
        np.testing.assert_allclose(
            np.asarray(acts), table[ids], rtol=1e-5, atol=1e-6
        )

    def test_embed_reduce_rank3_direct(self):
        layer = EmbedReduce(20, 4, key=jax.random.key(0), combiner="mean")
        rng = np.random.default_rng(2)
        ids = rng.integers(0, 20, size=(5, 3, 2))
        out = layer(ids)
        assert out.shape == (5, 3, 4)
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(layer.embeddings)[ids].mean(axis=-2),
            rtol=1e-5,
        )

    def test_invalid_output_shape_rejected(self):
        t = TableConfig("t", 48, 8)
        with pytest.raises(ValueError, match="leading dims"):
            FeatureConfig("f", t, (8, 2, 3), (4, 2, 8))


# ---------------------------------------------------------------------------
# Training integration: regularized loss actually shrinks weights
# ---------------------------------------------------------------------------
def test_regularization_in_train_step():
    from keras_rs_tpu import training

    model = Dense(
        4, 2, key=jax.random.key(0),
        kernel_regularizer=reg_lib.L2(0.5), use_bias=False,
    )

    def loss_fn(model, batch):
        return reg_lib.regularization_loss(model)

    state = training.create_train_state(model, optax.sgd(0.1))
    step = training.make_train_step(loss_fn, optax.sgd(0.1), donate=False)
    before = np.abs(np.asarray(model.kernel)).sum()
    state, _ = step(state, None)
    after = np.abs(np.asarray(state.model.kernel)).sum()
    assert after < before  # pure decay: |W| strictly shrinks
