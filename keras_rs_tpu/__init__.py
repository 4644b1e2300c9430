"""keras_rs_tpu: a TPU-native recommender-systems framework in JAX.

Built from scratch with the capability surface of keras-rs (see SURVEY.md),
redesigned TPU-first: pytree modules, explicit jitted train steps, sharded
embedding tables over a `jax.sharding.Mesh`, and Pallas kernels on the hot
paths.
"""

from keras_rs_tpu import core
from keras_rs_tpu import losses
from keras_rs_tpu import metrics
from keras_rs_tpu import ops
from keras_rs_tpu import serving
from keras_rs_tpu.version import __version__, version

__all__ = [
    "core",
    "losses",
    "metrics",
    "ops",
    "serving",
    "version",
    "__version__",
]
