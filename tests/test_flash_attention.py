"""Pallas flash attention vs the XLA oracle (interpret mode on CPU).

Covers the masking matrix (causal x key-padding), unaligned shapes
(T and head_dim not multiples of the 128-lane tile), bf16 inputs, and
gradients through the custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu.ops import flash_attention as fa


def _rand_qkv(B, T, H, hd, dtype=jnp.float32, seed=0):
    key = jax.random.key(seed)
    kq, kk, kv, km = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, T, H, hd), dtype)
    k = jax.random.normal(kk, (B, T, H, hd), dtype)
    v = jax.random.normal(kv, (B, T, H, hd), dtype)
    mask = (jax.random.uniform(km, (B, T)) > 0.25).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)  # every row keeps >= 1 valid key
    return q, k, v, mask


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("use_mask", [True, False])
def test_forward_matches_oracle(causal, use_mask):
    q, k, v, mask = _rand_qkv(2, 200, 4, 48)
    m = mask if use_mask else None
    out = fa.flash_attention(
        q, k, v, causal=causal, key_mask=m, interpret=True
    )
    ref = fa.attention_reference(q, k, v, causal=causal, key_mask=m)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_gradients_match_oracle(causal):
    q, k, v, mask = _rand_qkv(2, 136, 2, 32, seed=1)

    def loss_flash(q, k, v):
        out = fa.flash_attention(
            q, k, v, causal=causal, key_mask=mask, interpret=True
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        out = fa.attention_reference(
            q, k, v, causal=causal, key_mask=mask
        )
        return jnp.sum(jnp.sin(out))

    gf = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_bf16_inputs():
    q, k, v, mask = _rand_qkv(1, 128, 2, 64, dtype=jnp.bfloat16, seed=2)
    out = fa.flash_attention(
        q, k, v, causal=True, key_mask=mask, interpret=True
    )
    ref = fa.attention_reference(q, k, v, causal=True, key_mask=mask)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref.astype(jnp.float32), atol=3e-2
    )


def test_short_sequence_padding():
    # T < BLOCK_Q exercises the all-padding tail path.
    q, k, v, _ = _rand_qkv(3, 17, 1, 8, seed=3)
    out = fa.flash_attention(q, k, v, causal=True, interpret=True)
    ref = fa.attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_mha_layer_flash_flag_matches_xla_path():
    from keras_rs_tpu.layers.attention import MultiHeadSelfAttention

    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (2, 64, 32))
    mask = jnp.ones((2, 64), jnp.float32).at[:, 50:].set(0.0)
    mha = MultiHeadSelfAttention(32, 4, key=key)
    ref = mha(x, padding_mask=mask)

    # Force the flash path (interpret-mode pallas on CPU).
    import keras_rs_tpu.ops.flash_attention as fa_mod
    orig = fa_mod.flash_attention
    fa_mod.flash_attention = lambda *a, **kw: orig(
        *a, **{**kw, "interpret": True}
    )
    try:
        mha.use_flash = True
        out = mha(x, padding_mask=mask)
    finally:
        fa_mod.flash_attention = orig
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
