"""Fused multi-head attention (Pallas TPU kernel) with custom VJP.

TPU-native replacement for the unfused XLA attention used by transformer
sequence encoders (reference composes keras-hub TransformerDecoder,
examples/sas_rec.py:393-430, which materializes the [B, H, T, T] probs
tensor in HBM on every layer, forward and backward).

Design (query-blocked, keys resident in VMEM):
  - grid = (batch*heads, T // BLOCK_Q); each program computes one
    [BLOCK_Q, head_dim] output tile.
  - K and V for the whole sequence live in VMEM (T=8192, hd=128, f32 is
    4 MB/each — comfortably inside the ~16 MB budget), so the scores tile
    [BLOCK_Q, T] never touches HBM. HBM traffic drops from
    O(B*H*T^2) to O(B*T*H*hd): the kernel is MXU-bound, not HBM-bound.
  - Scores/softmax in f32 regardless of input dtype (bf16 inputs hit the
    MXU natively; accumulation stays f32).
  - backward: one kernel per (bh, q-block) computing the dq tile and
    accumulating dk/dv across q-blocks in VMEM (Pallas sequential-grid
    reduction pattern), recomputing probs from the saved logsumexp.

Masking: causal (decoder) plus an additive key bias (0 / -1e9) that
encodes key-padding, matching layers.attention's XLA reference path
bit-for-bit in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keras_rs_tpu.utils.shape_utils import round_up as _round_up

NEG_INF = -1e9
BLOCK_Q = 128
_LANE = 128



# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale,
                causal):
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # [BQ, hd]
    k = k_ref[0].astype(jnp.float32)  # [T, hd]
    v = v_ref[0].astype(jnp.float32)  # [T, hd]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, T]
    s = s + bias_ref[0]
    if causal:
        rows = iq * BLOCK_Q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols <= rows, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = jnp.transpose(m + jnp.log(l))  # [1, BQ]


# ---------------------------------------------------------------------------
# Backward kernels. Two passes so peak VMEM stays ~O(T*hd) per ref instead
# of holding k, v, dk, dv all at once:
#   dq pass : grid (BH, nQ), keys/values resident, one dq tile per program
#   dkv pass: grid (BH, nK), queries/cotangents resident, one dk/dv tile
# Probabilities are recomputed from the saved logsumexp in both.
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, *, scale, causal, bq):
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # [BQ, hd]
    k = k_ref[0].astype(jnp.float32)  # [T, hd]
    v = v_ref[0].astype(jnp.float32)  # [T, hd]
    do = do_ref[0].astype(jnp.float32)  # [BQ, hd]
    lse = jnp.transpose(lse_ref[0])  # [BQ, 1]
    delta = jnp.transpose(delta_ref[0])  # [BQ, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[0]
    if causal:
        rows = iq * bq + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols <= rows, s, NEG_INF)
    p = jnp.exp(s - lse)  # [BQ, T]

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, *, scale, causal, bq):
    jk = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # [T, hd]
    k = k_ref[0].astype(jnp.float32)  # [BK, hd]
    v = v_ref[0].astype(jnp.float32)  # [BK, hd]
    do = do_ref[0].astype(jnp.float32)  # [T, hd]
    lse = lse_ref[0][0]  # [T]
    delta = delta_ref[0][0]  # [T]

    # s[r, c] = score of key (jk*BK + r) against query c.
    s = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BK, T]
    s = s + jnp.transpose(bias_ref[0])  # [BK, 1] key bias over queries
    if causal:
        key_pos = jk * bq + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0
        )
        query_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_pos <= query_pos, s, NEG_INF)
    p = jnp.exp(s - lse[None, :])  # [BK, T]

    dv_ref[0] = jax.lax.dot_general(
        p, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, T]
    ds = p * (dp - delta[None, :]) * scale
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers (operate on [BH, T, hd] padded arrays)
# ---------------------------------------------------------------------------


def _fwd_call(q, k, v, bias, scale, causal, interpret):
    BH, T, hd = q.shape
    grid = (BH, T // BLOCK_Q)
    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, T, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, BLOCK_Q), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, hd), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias)


def _bwd_call(q, k, v, bias, do, lse, delta, scale, causal, interpret):
    BH, T, hd = q.shape
    # At T=8192, hd=128 the backward tiles brush the default 16 MB
    # scoped-VMEM budget (overflow ~48 KB); raise the cap for the
    # backward kernels only.
    bq = BLOCK_Q
    grid = (BH, T // bq)
    params = pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, bq=bq
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, T, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, T, hd), q.dtype),
        compiler_params=params,
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, bq=bq
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, hd), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, bq, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, bq, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, T, hd), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, bq, hd), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, hd), jnp.float32),
            jax.ShapeDtypeStruct((BH, T, hd), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


# custom_vjp over the padded [BH, T, hd] arrays + bias.
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_padded(q, k, v, bias, scale, causal, interpret):
    out, _ = _fwd_call(q, k, v, bias, scale, causal, interpret)
    return out


def _flash_padded_fwd(q, k, v, bias, scale, causal, interpret):
    out, lse = _fwd_call(q, k, v, bias, scale, causal, interpret)
    return out, (q, k, v, bias, out, lse)


def _flash_padded_bwd(scale, causal, interpret, res, g):
    q, k, v, bias, out, lse = res
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]
    dq, dk, dv = _bwd_call(
        q, k, v, bias, g, lse, delta, scale, causal, interpret
    )
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


_flash_padded.defvjp(_flash_padded_fwd, _flash_padded_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    key_mask: jax.Array | None = None,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention. q, k, v: [B, T, H, hd]; key_mask: [B, T] (1=real).

    Returns [B, T, H, hd]. Differentiable w.r.t. q, k, v.
    """
    B, T, Hn, hd = q.shape
    if scale is None:
        scale = 1.0 / (hd ** 0.5)

    Tp = _round_up(max(T, BLOCK_Q), BLOCK_Q)
    hdp = _round_up(hd, _LANE)

    def pack(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * Hn, T, hd)
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, hdp - hd)))

    qp, kp, vp = pack(q), pack(k), pack(v)

    if key_mask is None:
        valid = jnp.ones((B, T), jnp.float32)
    else:
        valid = key_mask.astype(jnp.float32)
    valid = jnp.pad(valid, ((0, 0), (0, Tp - T)))
    bias = jnp.where(valid > 0, 0.0, NEG_INF).astype(jnp.float32)
    bias = jnp.repeat(bias, Hn, axis=0)[:, None, :]  # [B*H, 1, Tp]

    out = _flash_padded(qp, kp, vp, bias, scale, causal, interpret)
    out = out[:, :T, :hd].reshape(B, Hn, T, hd)
    return jnp.transpose(out, (0, 2, 1, 3))


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    key_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Unfused XLA attention with identical masking semantics (oracle)."""
    B, T, Hn, hd = q.shape
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        cm = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    if key_mask is not None:
        logits = jnp.where(
            key_mask[:, None, None, :].astype(bool), logits, NEG_INF
        )
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=v.dtype,
    )
