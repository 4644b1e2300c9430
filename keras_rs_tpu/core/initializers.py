"""Parameter initializers (Keras-compatible semantics, JAX-native).

The reference relies on `keras.initializers` everywhere; notably
`TableConfig`'s default initializer is
`VarianceScaling(mode="fan_out", distribution="truncated_normal")`
(keras_rs/src/layers/embedding/distributed_embedding_config.py:54-56).
We reimplement the same math on top of `jax.random`.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from keras_rs_tpu.types import DType, Shape

# Stddev of a unit normal truncated to [-2, 2]; Keras divides by this so the
# post-truncation standard deviation matches the requested one.
_TRUNCATED_STD_CORRECTION = 0.87962566103423978


def _compute_fans(shape: Shape) -> tuple[int, int]:
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape[0], shape[1]
    # Conv-style kernels: receptive field size times in/out channels.
    receptive = math.prod(shape[:-2])
    return shape[-2] * receptive, shape[-1] * receptive


class Initializer:
    def __call__(
        self, key: jax.Array, shape: Shape, dtype: DType = jnp.float32
    ) -> jax.Array:
        raise NotImplementedError

    def get_config(self) -> dict[str, Any]:
        return {}

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "Initializer":
        return cls(**config)


class Zeros(Initializer):
    def __call__(self, key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)


class Ones(Initializer):
    def __call__(self, key, shape, dtype=jnp.float32):
        return jnp.ones(shape, dtype)


class Constant(Initializer):
    def __init__(self, value: float = 0.0):
        self.value = value

    def __call__(self, key, shape, dtype=jnp.float32):
        return jnp.full(shape, self.value, dtype)

    def get_config(self):
        return {"value": self.value}


class RandomNormal(Initializer):
    def __init__(self, mean: float = 0.0, stddev: float = 0.05):
        self.mean = mean
        self.stddev = stddev

    def __call__(self, key, shape, dtype=jnp.float32):
        return self.mean + self.stddev * jax.random.normal(key, shape, dtype)

    def get_config(self):
        return {"mean": self.mean, "stddev": self.stddev}


class RandomUniform(Initializer):
    def __init__(self, minval: float = -0.05, maxval: float = 0.05):
        self.minval = minval
        self.maxval = maxval

    def __call__(self, key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=self.minval, maxval=self.maxval
        )

    def get_config(self):
        return {"minval": self.minval, "maxval": self.maxval}


class TruncatedNormal(Initializer):
    def __init__(self, mean: float = 0.0, stddev: float = 0.05):
        self.mean = mean
        self.stddev = stddev

    def __call__(self, key, shape, dtype=jnp.float32):
        return self.mean + self.stddev * jax.random.truncated_normal(
            key, -2.0, 2.0, shape, dtype
        )

    def get_config(self):
        return {"mean": self.mean, "stddev": self.stddev}


class VarianceScaling(Initializer):
    """Keras-compatible VarianceScaling.

    scale / fan is the variance target; `truncated_normal` corrects for the
    variance shrink of truncation to match Keras bit-for-bit semantics.
    """

    def __init__(
        self,
        scale: float = 1.0,
        mode: str = "fan_in",
        distribution: str = "truncated_normal",
    ):
        if scale <= 0.0:
            raise ValueError(f"`scale` must be positive, got {scale}.")
        if mode not in ("fan_in", "fan_out", "fan_avg"):
            raise ValueError(f"Invalid `mode`: {mode}")
        if distribution not in ("truncated_normal", "normal", "uniform",
                                "untruncated_normal"):
            raise ValueError(f"Invalid `distribution`: {distribution}")
        self.scale = scale
        self.mode = mode
        self.distribution = distribution

    def __call__(self, key, shape, dtype=jnp.float32):
        fan_in, fan_out = _compute_fans(shape)
        if self.mode == "fan_in":
            denom = max(1.0, fan_in)
        elif self.mode == "fan_out":
            denom = max(1.0, fan_out)
        else:
            denom = max(1.0, (fan_in + fan_out) / 2.0)
        variance = self.scale / denom
        if self.distribution == "truncated_normal":
            stddev = math.sqrt(variance) / _TRUNCATED_STD_CORRECTION
            return stddev * jax.random.truncated_normal(
                key, -2.0, 2.0, shape, dtype
            )
        elif self.distribution in ("normal", "untruncated_normal"):
            stddev = math.sqrt(variance)
            return stddev * jax.random.normal(key, shape, dtype)
        else:
            limit = math.sqrt(3.0 * variance)
            return jax.random.uniform(
                key, shape, dtype, minval=-limit, maxval=limit
            )

    def get_config(self):
        return {
            "scale": self.scale,
            "mode": self.mode,
            "distribution": self.distribution,
        }


class GlorotUniform(VarianceScaling):
    def __init__(self):
        super().__init__(scale=1.0, mode="fan_avg", distribution="uniform")

    def get_config(self):
        return {}


class GlorotNormal(VarianceScaling):
    def __init__(self):
        super().__init__(
            scale=1.0, mode="fan_avg", distribution="truncated_normal"
        )

    def get_config(self):
        return {}


class HeUniform(VarianceScaling):
    def __init__(self):
        super().__init__(scale=2.0, mode="fan_in", distribution="uniform")

    def get_config(self):
        return {}


class HeNormal(VarianceScaling):
    def __init__(self):
        super().__init__(
            scale=2.0, mode="fan_in", distribution="truncated_normal"
        )

    def get_config(self):
        return {}


_ALIASES = {
    "zeros": Zeros,
    "ones": Ones,
    "random_normal": RandomNormal,
    "random_uniform": RandomUniform,
    "truncated_normal": TruncatedNormal,
    "variance_scaling": VarianceScaling,
    "glorot_uniform": GlorotUniform,
    "glorot_normal": GlorotNormal,
    "he_uniform": HeUniform,
    "he_normal": HeNormal,
}


def get(identifier) -> Initializer:
    """Resolve a string / instance / callable into an Initializer."""
    if isinstance(identifier, Initializer):
        return identifier
    if isinstance(identifier, str):
        name = identifier.lower()
        if name not in _ALIASES:
            raise ValueError(f"Unknown initializer: {identifier!r}")
        return _ALIASES[name]()
    if callable(identifier):
        return identifier  # type: ignore[return-value]
    raise ValueError(f"Cannot interpret initializer: {identifier!r}")


def serialize(initializer) -> dict[str, Any]:
    return {
        "class_name": type(initializer).__name__,
        "config": initializer.get_config(),
    }


def deserialize(spec) -> Initializer:
    if isinstance(spec, str):
        return get(spec)
    by_name = {cls.__name__: cls for cls in set(_ALIASES.values())} | {
        "Constant": Constant,
        "TruncatedNormal": TruncatedNormal,
    }
    cls = by_name[spec["class_name"]]
    return cls.from_config(spec["config"])
