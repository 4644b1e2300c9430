from keras_rs_tpu.ops import pairwise
from keras_rs_tpu.ops import ranking

__all__ = ["pairwise", "ranking"]
