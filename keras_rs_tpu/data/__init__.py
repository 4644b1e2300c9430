from keras_rs_tpu.data.feature_engineering import (
    TextVectorizer,
    Vocabulary,
    bucketize,
    hash_cross,
    hash_strings,
)
from keras_rs_tpu.data.loader import ThreadedDataLoader
from keras_rs_tpu.data.ragged import Ragged

__all__ = [
    "Ragged",
    "TextVectorizer",
    "ThreadedDataLoader",
    "Vocabulary",
    "bucketize",
    "hash_cross",
    "hash_strings",
]
