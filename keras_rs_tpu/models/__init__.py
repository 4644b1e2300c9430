from keras_rs_tpu.models.ranking_model import BasicRanking, mse_loss
from keras_rs_tpu.models.two_tower import TwoTower, in_batch_softmax_loss

__all__ = [
    "BasicRanking",
    "TwoTower",
    "in_batch_softmax_loss",
    "mse_loss",
]
