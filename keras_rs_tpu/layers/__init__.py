from keras_rs_tpu.layers.attention import (
    Embedding,
    LayerNorm,
    MultiHeadSelfAttention,
    PositionEmbedding,
    TransformerBlock,
)
from keras_rs_tpu.layers.dense import MLP, Dense
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)
from keras_rs_tpu.layers.embedding.embed_reduce import (
    EmbedReduce,
    QuantizedEmbedReduce,
)
from keras_rs_tpu.layers.feature_interaction.dot_interaction import (
    DotInteraction,
)
from keras_rs_tpu.layers.feature_interaction.feature_cross import FeatureCross
from keras_rs_tpu.layers.recurrent import GRU
from keras_rs_tpu.layers.retrieval.hard_negative_mining import (
    HardNegativeMining,
)
from keras_rs_tpu.layers.retrieval.kmeans_retrieval import KMeansRetrieval
from keras_rs_tpu.layers.retrieval.remove_accidental_hits import (
    RemoveAccidentalHits,
)
from keras_rs_tpu.layers.retrieval.retrieval import (
    BruteForceRetrieval,
    Retrieval,
)
from keras_rs_tpu.layers.retrieval.sampling_probability_correction import (
    SamplingProbabilityCorrection,
)

__all__ = [
    "BruteForceRetrieval",
    "Dense",
    "DistributedEmbedding",
    "DotInteraction",
    "EmbedReduce",
    "QuantizedEmbedReduce",
    "Embedding",
    "FeatureConfig",
    "FeatureCross",
    "GRU",
    "HardNegativeMining",
    "KMeansRetrieval",
    "LayerNorm",
    "MLP",
    "MultiHeadSelfAttention",
    "PositionEmbedding",
    "RemoveAccidentalHits",
    "Retrieval",
    "SamplingProbabilityCorrection",
    "TableConfig",
    "TransformerBlock",
]
