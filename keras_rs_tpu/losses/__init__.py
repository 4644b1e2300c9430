from keras_rs_tpu.losses.base import Loss
from keras_rs_tpu.losses.list_mle_loss import ListMLELoss
from keras_rs_tpu.losses.pairwise_losses import (
    PairwiseHingeLoss,
    PairwiseLogisticLoss,
    PairwiseLoss,
    PairwiseMeanSquaredError,
    PairwiseSoftZeroOneLoss,
)

__all__ = [
    "ListMLELoss",
    "Loss",
    "PairwiseHingeLoss",
    "PairwiseLogisticLoss",
    "PairwiseLoss",
    "PairwiseMeanSquaredError",
    "PairwiseSoftZeroOneLoss",
]
