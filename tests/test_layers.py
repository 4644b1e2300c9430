"""Tests for dense / interaction / retrieval layers.

Mirrors the reference's layer test coverage: golden math against numpy,
parameterized input shapes, jit-compatibility.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu import layers


# --- EmbedReduce -------------------------------------------------------------


@pytest.fixture
def embed():
    table = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
    return layers.EmbedReduce(10, 2, table=table, combiner="mean")


def test_embed_reduce_1d(embed):
    out = embed(jnp.array([0, 3, 9]))
    np.testing.assert_allclose(
        np.asarray(out), [[0, 1], [6, 7], [18, 19]]
    )


def test_embed_reduce_2d_mean(embed):
    out = embed(jnp.array([[0, 2], [4, 4]]))
    np.testing.assert_allclose(np.asarray(out), [[2, 3], [8, 9]])


def test_embed_reduce_2d_sum():
    table = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
    e = layers.EmbedReduce(10, 2, table=table, combiner="sum")
    out = e(jnp.array([[0, 2], [4, 4]]))
    np.testing.assert_allclose(np.asarray(out), [[4, 6], [16, 18]])


def test_embed_reduce_2d_sqrtn():
    table = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
    e = layers.EmbedReduce(10, 2, table=table, combiner="sqrtn")
    out = e(jnp.array([[0, 2], [4, 4]]))
    np.testing.assert_allclose(
        np.asarray(out),
        np.array([[4, 6], [16, 18]]) / np.sqrt(2.0),
        rtol=1e-6,
    )


def test_embed_reduce_weights_as_padding_mask(embed):
    # Second row has one real item (id 4) and one padded slot.
    out = embed(
        jnp.array([[0, 2], [4, 0]]),
        weights=jnp.array([[1.0, 1.0], [1.0, 0.0]]),
    )
    np.testing.assert_allclose(np.asarray(out), [[2, 3], [8, 9]])


def test_embed_reduce_zero_weights_row(embed):
    out = embed(
        jnp.array([[0, 2]]), weights=jnp.array([[0.0, 0.0]])
    )
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0]])


def test_embed_reduce_1d_sum_scales_by_weights():
    table = jnp.ones((5, 3))
    e = layers.EmbedReduce(5, 3, table=table, combiner="sum")
    out = e(jnp.array([1, 2]), weights=jnp.array([2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(out), [[2, 2, 2], [3, 3, 3]])
    # mean ignores weights for 1-D inputs.
    e2 = layers.EmbedReduce(5, 3, table=table, combiner="mean")
    out2 = e2(jnp.array([1, 2]), weights=jnp.array([2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(out2), 1.0)


def test_embed_reduce_invalid_combiner():
    with pytest.raises(ValueError):
        layers.EmbedReduce(5, 3, table=jnp.ones((5, 3)), combiner="max")


# --- FeatureCross ------------------------------------------------------------


def test_feature_cross_math_full_rank():
    key = jax.random.key(0)
    fc = layers.FeatureCross(4, key=key)
    x0 = jax.random.normal(jax.random.key(1), (3, 4))
    x = jax.random.normal(jax.random.key(2), (3, 4))
    out = fc(x0, x)
    expected = x0 * (x @ fc.kernel + fc.bias) + x
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_feature_cross_low_rank():
    fc = layers.FeatureCross(8, key=jax.random.key(0), projection_dim=2)
    assert fc.down_proj_kernel.shape == (8, 2)
    assert fc.kernel.shape == (2, 8)
    x0 = jax.random.normal(jax.random.key(1), (3, 8))
    out = fc(x0)
    expected = x0 * ((x0 @ fc.down_proj_kernel) @ fc.kernel + fc.bias) + x0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5
    )


def test_feature_cross_diag_scale():
    fc = layers.FeatureCross(4, key=jax.random.key(0), diag_scale=0.5)
    x0 = jax.random.normal(jax.random.key(1), (2, 4))
    out = fc(x0)
    expected = x0 * (x0 @ fc.kernel + fc.bias + 0.5 * x0) + x0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_feature_cross_shape_mismatch():
    fc = layers.FeatureCross(4, key=jax.random.key(0))
    with pytest.raises(ValueError):
        fc(jnp.ones((2, 4)), jnp.ones((3, 4)))


def test_feature_cross_invalid_diag_scale():
    with pytest.raises(ValueError):
        layers.FeatureCross(4, key=jax.random.key(0), diag_scale=-1.0)


# --- DotInteraction ----------------------------------------------------------


def _np_dot_interaction(feats, self_interaction, skip_gather):
    f = np.stack(feats, axis=1)
    m = f @ f.transpose(0, 2, 1)
    n = m.shape[1]
    if skip_gather:
        k = 0 if self_interaction else -1
        return (m * np.tril(np.ones((n, n)), k=k)).reshape(len(f), -1)
    rows, cols = np.tril_indices(n, k=0 if self_interaction else -1)
    return m[:, rows, cols]


@pytest.mark.parametrize("self_interaction", [False, True])
@pytest.mark.parametrize("skip_gather", [False, True])
def test_dot_interaction(self_interaction, skip_gather):
    feats = [
        np.random.default_rng(i).normal(size=(3, 4)).astype(np.float32)
        for i in range(3)
    ]
    layer = layers.DotInteraction(
        self_interaction=self_interaction, skip_gather=skip_gather
    )
    out = layer([jnp.asarray(f) for f in feats])
    expected = _np_dot_interaction(feats, self_interaction, skip_gather)
    assert out.shape[-1] == layer.output_dim(3)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


# --- Retrieval ---------------------------------------------------------------


def test_brute_force_retrieval():
    rng = np.random.default_rng(0)
    candidates = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    layer = layers.BruteForceRetrieval(candidates, k=5)
    scores, ids = layer(queries)
    expected_scores = np.asarray(queries) @ np.asarray(candidates).T
    expected_top = np.argsort(-expected_scores, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(ids), expected_top)
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(expected_scores, expected_top, axis=1),
        rtol=1e-5,
    )


def test_brute_force_retrieval_with_ids():
    candidates = jnp.eye(4, dtype=jnp.float32)
    ids = jnp.array([10, 20, 30, 40])
    layer = layers.BruteForceRetrieval(candidates, ids, k=1)
    _, top = layer(jnp.array([[0.0, 1.0, 0.0, 0.0]]))
    assert int(top[0, 0]) == 20


def test_brute_force_retrieval_no_scores():
    layer = layers.BruteForceRetrieval(
        jnp.eye(3, dtype=jnp.float32), k=2, return_scores=False
    )
    out = layer(jnp.array([[1.0, 0.5, 0.0]]))
    np.testing.assert_array_equal(np.asarray(out), [[0, 1]])


def test_brute_force_update_candidates():
    layer = layers.BruteForceRetrieval(k=1)
    with pytest.raises(ValueError):
        layer(jnp.ones((1, 3)))
    layer.update_candidates(jnp.eye(3, dtype=jnp.float32))
    _, ids = layer(jnp.array([[0.0, 0.0, 1.0]]))
    assert int(ids[0, 0]) == 2


def test_hard_negative_mining():
    logits = jnp.array([[1.0, 5.0, 3.0, 2.0], [4.0, 1.0, 2.0, 3.0]])
    labels = jnp.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    layer = layers.HardNegativeMining(num_hard_negatives=1)
    out_logits, out_labels = layer(logits, labels)
    # Row 1: positive idx 0 (logit 1) + hardest negative idx 1 (logit 5).
    # Row 2: positive idx 1 (logit 1) + hardest negative idx 0 (logit 4).
    assert out_logits.shape == (2, 2)
    assert sorted(np.asarray(out_logits)[0].tolist()) == [1.0, 5.0]
    assert sorted(np.asarray(out_logits)[1].tolist()) == [1.0, 4.0]
    np.testing.assert_allclose(np.asarray(out_labels).sum(axis=1), 1.0)


def test_remove_accidental_hits():
    logits = jnp.zeros((2, 4))
    labels = jnp.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    # Row 1's positive has id 7; negative idx 2 shares id 7 -> penalized.
    candidate_ids = jnp.array([7, 3, 7, 5])
    layer = layers.RemoveAccidentalHits()
    out = np.asarray(layer(logits, labels, candidate_ids))
    assert out[0, 2] < -1e30  # accidental hit
    assert out[0, 0] == 0.0  # the positive itself is kept
    assert out[0, 1] == 0.0 and out[0, 3] == 0.0
    assert out[1, 1] == 0.0 and (out[1] < -1e30).sum() == 0


def test_sampling_probability_correction():
    logits = jnp.array([[1.0, 2.0]])
    probs = jnp.array([[0.5, 1e-12]])
    layer = layers.SamplingProbabilityCorrection()
    out = np.asarray(layer(logits, probs))
    np.testing.assert_allclose(
        out, [[1.0 - np.log(0.5), 2.0 - np.log(1e-6)]], rtol=1e-6
    )


def test_layers_jit_and_grad():
    fc = layers.FeatureCross(4, key=jax.random.key(0))

    @jax.jit
    def loss_fn(fc, x):
        return jnp.sum(fc(x) ** 2)

    x = jax.random.normal(jax.random.key(1), (2, 4))
    g = jax.grad(loss_fn)(fc, x)
    assert g.kernel.shape == (4, 4)
    assert float(jnp.abs(g.kernel).sum()) > 0


def test_mlp():
    mlp = layers.MLP(8, [16, 4, 1], key=jax.random.key(0))
    out = mlp(jnp.ones((2, 8)))
    assert out.shape == (2, 1)
