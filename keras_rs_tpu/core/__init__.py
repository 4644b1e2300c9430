from keras_rs_tpu.core import initializers
from keras_rs_tpu.core import regularizers
from keras_rs_tpu.core import serialization
from keras_rs_tpu.core.module import (
    Module,
    is_param,
    replace,
    trainable_mask,
    tree_paths,
)

__all__ = [
    "Module",
    "initializers",
    "regularizers",
    "is_param",
    "replace",
    "serialization",
    "trainable_mask",
    "tree_paths",
]
