"""Quantization utilities: stochastic rounding for low-precision tables.

bfloat16 embedding tables halve HBM footprint and double gather/scatter
bandwidth, but deterministic round-to-nearest on updates loses small
gradient contributions (lr * g often underflows a bf16 ulp). Stochastic
rounding makes the expected value of the stored row equal to the f32
update, which is the standard production fix for low-precision embedding
training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from keras_rs_tpu.types import Tensor


def stochastic_round_bf16(x: Tensor, key: jax.Array) -> Tensor:
    """Rounds f32 -> bf16 stochastically: P(round up) = frac distance.

    bf16 is the top 16 bits of f32, so adding uniform random low-16 bits
    before truncation implements exact stochastic rounding.
    """
    x = x.astype(jnp.float32)
    bits = jax.random.bits(key, x.shape, jnp.uint32)
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = xi + (bits & jnp.uint32(0xFFFF))
    hi = (rounded >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


def quantize_rows_int8(table: Tensor) -> tuple[Tensor, Tensor]:
    """Symmetric per-row int8 quantization for inference tables.

    Returns `(q, scale)` with `q` int8 [R, dim] and `scale` f32 [R, 1]
    such that `q * scale ~= table` (max abs error <= scale/2 per
    element, i.e. absmax/254 per row). Zero rows get scale 1 so the
    dequantized row is exactly zero. 4x less serving HBM than f32 (2x
    vs bf16); row gathers are descriptor-bound on TPU, so the smaller
    rows cost no extra latency (BASELINE.md key-op table). Same scheme
    as the int8 asymmetric-hashing store in
    layers/retrieval/kmeans_retrieval.py.
    """
    x = jnp.asarray(table, jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_rows(q: Tensor, scale: Tensor) -> Tensor:
    """Inverse of `quantize_rows_int8` (up to rounding)."""
    return q.astype(jnp.float32) * scale


def cast_rows_for_storage(
    x: Tensor, dtype: jnp.dtype, key: jax.Array | None
) -> Tensor:
    """Casts updated rows to the table's storage dtype.

    f32 passes through; bf16 uses stochastic rounding when a key is given,
    else round-to-nearest.
    """
    if dtype == jnp.float32:
        return x.astype(jnp.float32)
    if dtype == jnp.bfloat16:
        if key is None:
            return x.astype(jnp.bfloat16)
        return stochastic_round_bf16(x, key)
    raise ValueError(f"Unsupported table dtype: {dtype}")
