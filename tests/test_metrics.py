"""Tests for ranking metrics, mirroring the reference's test strategy:
golden per-list math computed in pure Python, accumulation/statefulness,
masking, sample weights, and jit-compatibility.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu import metrics

Y_TRUE = jnp.array(
    [
        [0, 0, 1, 0],
        [1, 0, 3, 2],
        [0, 0, 0, 0],
        [2, 1, 0, 0],
    ],
    dtype=jnp.float32,
)
Y_PRED = jnp.array(
    [
        [0.1, 0.2, 0.9, 0.3],
        [0.1, 0.8, 0.9, 0.7],
        [0.4, 0.3, 0.2, 0.1],
        [0.9, 0.7, 0.1, 0.2],
    ],
    dtype=jnp.float32,
)


def dcg_from(labels, ranks):
    return sum(
        (2.0**lab - 1.0) / math.log2(r + 1) for lab, r in zip(labels, ranks)
    )


def test_ndcg_batched():
    expected_dcg = [
        dcg_from([1], [1]),
        dcg_from([3, 2, 1], [1, 3, 4]),
        0.0,
        dcg_from([2, 1], [1, 2]),
    ]
    expected_idcg = [
        dcg_from([1], [1]),
        dcg_from([3, 2, 1], [1, 2, 3]),
        0.0,
        dcg_from([2, 1], [1, 2]),
    ]
    expected = sum(
        a / b if b else 0.0 for a, b in zip(expected_dcg, expected_idcg)
    ) / 4.0
    m = metrics.NDCG(shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(float(m.result()), expected, atol=1e-4)


def test_dcg_batched():
    expected = (
        dcg_from([1], [1])
        + dcg_from([3, 2, 1], [1, 3, 4])
        + 0.0
        + dcg_from([2, 1], [1, 2])
    ) / 4.0
    m = metrics.DCG(shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(float(m.result()), expected, atol=1e-4)


def test_dcg_k():
    expected = (
        dcg_from([1], [1])
        + dcg_from([3], [1])  # rank 3, 4 cut off by k=2
        + 0.0
        + dcg_from([2, 1], [1, 2])
    ) / 4.0
    m = metrics.DCG(k=2, shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(float(m.result()), expected, atol=1e-4)


def test_mrr():
    # Positions of the first relevant item (descending score order):
    # list 1: item idx 2 (score .9) -> rank 1
    # list 2: scores [.1,.8,.9,.7]; relevant idx 0,2,3; top item idx 2 rank 1
    # list 3: no relevant -> 0
    # list 4: item idx 0 -> rank 1, (2 also relevant -> rank 1 wins)
    expected = (1.0 + 1.0 + 0.0 + 1.0) / 3.0  # list 3 weight=avg ->counts
    m = metrics.MeanReciprocalRank(shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED)
    # get_list_weights: all-ones weights -> every list weight 1 -> mean over 4
    np.testing.assert_allclose(float(m.result()), 3.0 / 4.0, atol=1e-4)
    del expected


def test_precision_at_k():
    # Top-2 by score per list: [idx2,idx3], [idx2,idx1], [...], [idx0,idx1].
    # P@2 per list: [1/2, 1/2, 0, 2/2]; mean over 4 lists.
    m = metrics.PrecisionAtK(k=2, shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(
        float(m.result()), (0.5 + 0.5 + 0.0 + 1.0) / 4.0, atol=1e-4
    )


def test_recall_at_k():
    # R@2 per list: [1/1, 1/3, 0, 2/2]
    m = metrics.RecallAtK(k=2, shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(
        float(m.result()), (1.0 + 1.0 / 3.0 + 0.0 + 1.0) / 4.0, atol=1e-4
    )


def test_map():
    # AP per list:
    # 1: rel at rank 1 -> 1.0
    # 2: rel ranks 1,3,4 -> (1/1 + 2/3 + 3/4)/3
    # 3: 0
    # 4: rel ranks 1,2 -> (1 + 1)/2
    ap2 = (1.0 + 2.0 / 3.0 + 3.0 / 4.0) / 3.0
    m = metrics.MeanAveragePrecision(shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(
        float(m.result()), (1.0 + ap2 + 0.0 + 1.0) / 4.0, atol=1e-4
    )


def test_statefulness_and_reset():
    m = metrics.PrecisionAtK(k=2, shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED)
    first = float(m.result())
    m.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(float(m.result()), first, atol=1e-5)
    m.reset_state()
    assert float(m.result()) == 0.0


def test_unbatched_inputs():
    m = metrics.MeanReciprocalRank(shuffle_ties=False)
    m.update_state(
        jnp.array([0.0, 1.0, 0.0]), jnp.array([0.9, 0.5, 0.3])
    )
    np.testing.assert_allclose(float(m.result()), 0.5, atol=1e-5)


def test_mask_protocol():
    # Masking the relevant item removes all relevance -> list weight falls
    # back to avg weight and metric value is 0.
    m = metrics.MeanReciprocalRank(shuffle_ties=False)
    m.update_state(
        {
            "labels": jnp.array([[0.0, 1.0, 0.0]]),
            "mask": jnp.array([[True, False, True]]),
        },
        jnp.array([[0.9, 0.5, 0.3]]),
    )
    np.testing.assert_allclose(float(m.result()), 0.0, atol=1e-5)


def test_mask_pushes_items_out_of_topk():
    # With the top-scored item masked, rank 1 goes to the next item.
    m = metrics.MeanReciprocalRank(shuffle_ties=False)
    m.update_state(
        {
            "labels": jnp.array([[1.0, 1.0, 0.0]]),
            "mask": jnp.array([[False, True, True]]),
        },
        jnp.array([[0.9, 0.5, 0.3]]),
    )
    np.testing.assert_allclose(float(m.result()), 1.0, atol=1e-5)


def test_negative_labels_invalid():
    m = metrics.PrecisionAtK(k=2, shuffle_ties=False)
    m.update_state(
        jnp.array([[1.0, -1.0, 0.0, 1.0]]),
        jnp.array([[0.9, 0.8, 0.3, 0.5]]),
    )
    # Valid items: idx 0 (rel, s=.9), idx 2 (s=.3), idx 3 (rel, s=.5).
    # Top-2 among valid: idx 0, idx 3 -> both relevant -> P@2 = 1.
    np.testing.assert_allclose(float(m.result()), 1.0, atol=1e-5)


def test_scalar_and_listwise_sample_weight():
    m = metrics.RecallAtK(k=2, shuffle_ties=False)
    m.update_state(Y_TRUE, Y_PRED, sample_weight=2.0)
    m2 = metrics.RecallAtK(k=2, shuffle_ties=False)
    m2.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(
        float(m.result()), float(m2.result()), atol=1e-5
    )
    # 1-D weights: per-list.
    m3 = metrics.RecallAtK(k=2, shuffle_ties=False)
    m3.update_state(
        Y_TRUE, Y_PRED, sample_weight=jnp.array([1.0, 0.0, 0.0, 0.0])
    )
    np.testing.assert_allclose(float(m3.result()), 1.0, atol=1e-5)


def test_functional_update_is_jittable():
    m = metrics.NDCG(shuffle_ties=False)

    @jax.jit
    def step(state, yt, yp):
        return m.update(state, yt, yp)

    state = m.init_state()
    state = step(state, Y_TRUE, Y_PRED)
    state = step(state, Y_TRUE, Y_PRED)
    result = m.result_from_state(state)
    m2 = metrics.NDCG(shuffle_ties=False)
    m2.update_state(Y_TRUE, Y_PRED)
    np.testing.assert_allclose(float(result), float(m2.result()), atol=1e-4)


def test_merge_states():
    m = metrics.DCG(shuffle_ties=False)
    s1 = m.update(m.init_state(), Y_TRUE[:2], Y_PRED[:2])
    s2 = m.update(m.init_state(), Y_TRUE[2:], Y_PRED[2:])
    merged = m.merge(s1, s2)
    full = m.update(m.init_state(), Y_TRUE, Y_PRED)
    np.testing.assert_allclose(
        float(m.result_from_state(merged)),
        float(m.result_from_state(full)),
        atol=1e-4,
    )


def test_shuffle_ties_deterministic_with_key():
    m = metrics.NDCG(seed=3)
    ties_true = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    ties_pred = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    v1, w1 = m.compute(ties_true, ties_pred, key=jax.random.key(0))
    v2, _ = m.compute(ties_true, ties_pred, key=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    del w1


def test_serialization_roundtrip():
    from keras_rs_tpu.core import serialization

    m = metrics.NDCG(k=5, shuffle_ties=False, seed=7)
    restored = serialization.deserialize(serialization.serialize(m))
    assert isinstance(restored, metrics.NDCG)
    assert restored.k == 5 and restored.shuffle_ties is False


def test_invalid_k():
    with pytest.raises(ValueError):
        metrics.NDCG(k=0)


def test_auc_matches_sklearn_style_oracle():
    import numpy as np
    from keras_rs_tpu.metrics import AUC

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 2000).astype(np.float32)
    # Correlated scores -> AUC well above 0.5.
    scores = 1 / (1 + np.exp(-(labels * 1.5 + rng.normal(size=2000))))

    # Exact rank-based oracle (Wilcoxon).
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    n_pos, n_neg = labels.sum(), (1 - labels).sum()
    exact = (ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg
    )

    m = AUC(num_thresholds=512)
    # Streaming in chunks must equal one-shot.
    for i in range(0, 2000, 500):
        m.update_state(labels[i : i + 500], scores[i : i + 500])
    got = float(m.result())
    assert abs(got - exact) < 0.01, (got, exact)

    m2 = AUC(num_thresholds=512)
    m2.update_state(labels, scores)
    assert abs(float(m2.result()) - got) < 1e-6


def test_auc_jit_functional_state():
    import jax, jax.numpy as jnp
    import numpy as np
    from keras_rs_tpu.metrics import AUC

    m = AUC(num_thresholds=64)

    @jax.jit
    def eval_step(state, labels, scores):
        return m.update(state, labels, scores)

    rng = np.random.default_rng(1)
    labels = jnp.asarray(rng.integers(0, 2, 256).astype(np.float32))
    scores = jnp.asarray(rng.random(256).astype(np.float32))
    state = m.init_state()
    state = eval_step(state, labels, scores)
    state = eval_step(state, labels, scores)
    r = float(m.result_from_state(state))
    assert 0.0 <= r <= 1.0


def test_binary_accuracy():
    import numpy as np
    from keras_rs_tpu.metrics import BinaryAccuracy

    m = BinaryAccuracy()
    m.update_state([1, 0, 1, 0], [0.9, 0.2, 0.4, 0.6])
    assert abs(float(m.result()) - 0.5) < 1e-6
    m.update_state([1], [0.8], sample_weight=2.0)
    # total correct weight 2+2, count 6
    assert abs(float(m.result()) - 4 / 6) < 1e-6
