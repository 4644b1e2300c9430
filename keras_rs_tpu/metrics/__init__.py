from keras_rs_tpu.metrics.classification import (
    AUC,
    BinaryAccuracy,
    ConfusionState,
)
from keras_rs_tpu.metrics.ranking_metric import MeanState, RankingMetric
from keras_rs_tpu.metrics.ranking_metrics import (
    DCG,
    NDCG,
    MeanAveragePrecision,
    MeanReciprocalRank,
    PrecisionAtK,
    RecallAtK,
)

__all__ = [
    "AUC",
    "BinaryAccuracy",
    "ConfusionState",
    "DCG",
    "NDCG",
    "MeanAveragePrecision",
    "MeanReciprocalRank",
    "MeanState",
    "PrecisionAtK",
    "RankingMetric",
    "RecallAtK",
]
