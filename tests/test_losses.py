"""Golden-value tests for ranking losses.

Expected values mirror the reference's unit tests (keras_rs/src/losses/
*_test.py) so numerical parity with keras-rs is asserted directly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu import losses

UNBATCHED_SCORES = jnp.array([1.0, 3.0, 2.0, 4.0, 0.8])
UNBATCHED_LABELS = jnp.array([1.0, 0.0, 1.0, 3.0, 2.0])
BATCHED_SCORES = jnp.array(
    [[1.0, 3.0, 2.0, 4.0, 0.8], [1.0, 1.8, 2.0, 3.0, 2.0]]
)
BATCHED_LABELS = jnp.array(
    [[1.0, 0.0, 1.0, 3.0, 2.0], [0.0, 1.0, 2.0, 3.0, 1.5]]
)
MASK = jnp.array(
    [[True, True, True, True, True], [True, True, True, False, False]]
)


HINGE_EXPECTED = np.array(
    [
        [3.0, 0.0, 2.0, 0.0, 6.6000004],
        [0.0, 0.20000005, 1.8, 0.0, 0.79999995],
    ]
)
LOGISTIC_EXPECTED = np.array(
    [
        [2.126928, 0.0, 1.313262, 0.52873, 4.566504],
        [0.0, 0.371101, 1.604548, 1.016734, 0.9114],
    ]
)
SZO_EXPECTED = np.array(
    [
        [0.880797, 0.0, 0.731059, 0.474736, 2.218608],
        [0.0, 0.310025, 1.219108, 0.888561, 0.719108],
    ]
)
MSE_EXPECTED = np.array(
    [[12.44, 34.64, 9.84, 9.84, 28.76], [2.29, 1.41, 1.89, 1.89, 0.84]]
)

CASES = [
    (losses.PairwiseHingeLoss, HINGE_EXPECTED, 1.44),
    (losses.PairwiseLogisticLoss, LOGISTIC_EXPECTED, 1.243921),
    (losses.PairwiseSoftZeroOneLoss, SZO_EXPECTED, 0.744200),
    (losses.PairwiseMeanSquaredError, MSE_EXPECTED, 10.384),
]


@pytest.mark.parametrize("cls,expected,_", CASES)
def test_unbatched(cls, expected, _):
    loss = cls(reduction="none")
    out = loss(y_true=UNBATCHED_LABELS, y_pred=UNBATCHED_SCORES)
    np.testing.assert_allclose(np.asarray(out), [expected[0]], atol=1e-4)


@pytest.mark.parametrize("cls,expected,_", CASES)
def test_batched(cls, expected, _):
    loss = cls(reduction="none")
    out = loss(y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


@pytest.mark.parametrize("cls,_,expected_reduced", CASES)
def test_sum_over_batch_size(cls, _, expected_reduced):
    loss = cls(reduction="sum_over_batch_size")
    out = loss(y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES)
    np.testing.assert_allclose(float(out), expected_reduced, atol=1e-4)


@pytest.mark.parametrize("cls,expected,_", CASES)
def test_scalar_sample_weight(cls, expected, _):
    loss = cls(reduction="none")
    out = loss(
        y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES, sample_weight=5.0
    )
    np.testing.assert_allclose(np.asarray(out), expected * 5.0, atol=5e-4)


@pytest.mark.parametrize("cls,expected,_", CASES)
def test_itemwise_sample_weight(cls, expected, _):
    sw = np.array([[1.0, 1.0, 1.0, 1.0, 1.0], [1.0, 1.0, 1.0, 0.0, 0.0]])
    loss = cls(reduction="none")
    out = loss(
        y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES, sample_weight=sw
    )
    np.testing.assert_allclose(np.asarray(out), expected * sw, atol=1e-4)


def test_hinge_temperature():
    loss = losses.PairwiseHingeLoss(temperature=0.5, reduction="none")
    out = loss(y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES)
    np.testing.assert_allclose(
        np.asarray(out),
        [
            [5.0, 0.0, 3.0, 0.0, 10.200001],
            [0.0, 0.0, 1.5999999, 0.0, 0.5999999],
        ],
        atol=1e-4,
    )


def test_hinge_mask():
    loss = losses.PairwiseHingeLoss(reduction="none")
    out = loss(
        y_true={"labels": BATCHED_LABELS, "mask": MASK},
        y_pred=BATCHED_SCORES,
    )
    np.testing.assert_allclose(
        np.asarray(out),
        [
            [3.0, 0.0, 2.0, 0.0, 6.6000004],
            [0.0, 0.20000005, 0.79999995, 0.0, 0.0],
        ],
        atol=1e-4,
    )


def test_mse_mask():
    loss = losses.PairwiseMeanSquaredError(reduction="none")
    out = loss(
        y_true={"labels": BATCHED_LABELS, "mask": MASK},
        y_pred=BATCHED_SCORES,
    )
    np.testing.assert_allclose(
        np.asarray(out),
        [
            [12.440001, 34.64, 9.84, 9.84, 28.759998],
            [1.04, 0.68, 1.64, 0.0, 0.0],
        ],
        atol=1e-4,
    )


def test_invalid_rank_raises():
    bad = jnp.ones((2, 3, 4))
    loss = losses.PairwiseHingeLoss()
    with pytest.raises(ValueError):
        loss(y_true=bad, y_pred=bad)


def test_invalid_labels_ignored():
    labels = jnp.array([[1.0, -1.0, 2.0]])
    labels_masked = jnp.array([[1.0, 0.0, 2.0]])
    mask = jnp.array([[True, False, True]])
    scores = jnp.array([[1.0, 5.0, 2.0]])
    loss = losses.PairwiseHingeLoss(reduction="none")
    out_neg = loss(y_true=labels, y_pred=scores)
    out_mask = loss(
        y_true={"labels": labels_masked, "mask": mask}, y_pred=scores
    )
    np.testing.assert_allclose(np.asarray(out_neg), np.asarray(out_mask))


# --- ListMLE ---------------------------------------------------------------

MLE_EXPECTED = np.array([6.865693, 3.088192])


def test_list_mle_unbatched():
    loss = losses.ListMLELoss(reduction="none")
    out = loss(y_true=UNBATCHED_LABELS, y_pred=UNBATCHED_SCORES)
    assert out.shape == (1,)
    np.testing.assert_allclose(np.asarray(out), [MLE_EXPECTED[0]], atol=1e-4)


def test_list_mle_batched():
    loss = losses.ListMLELoss(reduction="none")
    out = loss(y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES)
    np.testing.assert_allclose(np.asarray(out), MLE_EXPECTED, atol=1e-4)


def test_list_mle_temperature():
    loss = losses.ListMLELoss(temperature=0.5, reduction="none")
    out = loss(y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES)
    np.testing.assert_allclose(
        np.asarray(out), [10.969891, 2.1283305], atol=1e-4
    )


def test_list_mle_reduced():
    loss = losses.ListMLELoss(reduction="sum_over_batch_size")
    out = loss(y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES)
    np.testing.assert_allclose(float(out), 4.9769425, atol=1e-4)


def test_list_mle_scalar_sample_weight():
    loss = losses.ListMLELoss(reduction="none")
    out = loss(
        y_true=BATCHED_LABELS, y_pred=BATCHED_SCORES, sample_weight=5.0
    )
    np.testing.assert_allclose(np.asarray(out), MLE_EXPECTED * 5.0, rtol=1e-4)


def test_loss_serialization_roundtrip():
    from keras_rs_tpu.core import serialization

    loss = losses.PairwiseHingeLoss(temperature=0.7)
    restored = serialization.deserialize(serialization.serialize(loss))
    assert restored.get_config() == loss.get_config()
    assert isinstance(restored, losses.PairwiseHingeLoss)


def test_losses_jittable():
    import jax

    loss = losses.PairwiseLogisticLoss()

    @jax.jit
    def f(labels, scores):
        return loss(y_true=labels, y_pred=scores)

    out = f(BATCHED_LABELS, BATCHED_SCORES)
    np.testing.assert_allclose(float(out), 1.243921, atol=1e-4)
