"""Streaming chunked top-k MIPS vs the direct [B, N] oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval
from keras_rs_tpu.ops.topk import chunked_topk_mips


@pytest.mark.parametrize("N,chunk", [(1000, 256), (777, 128), (64, 128)])
def test_matches_direct_topk(N, chunk):
    key = jax.random.key(0)
    kq, kc = jax.random.split(key)
    q = jax.random.normal(kq, (16, 32))
    c = jax.random.normal(kc, (N, 32))
    k = 10
    s, i = chunked_topk_mips(q, c, k, chunk)
    ref_s, ref_i = jax.lax.top_k(
        jnp.matmul(q, c.T, preferred_element_type=jnp.float32), k
    )
    np.testing.assert_allclose(s, ref_s, rtol=1e-6)
    np.testing.assert_array_equal(i, ref_i)


def test_tie_breaking_matches():
    # Duplicate candidates across chunk boundaries: the lower index must
    # win, exactly like a single global top_k.
    q = jnp.ones((4, 8))
    base = jax.random.normal(jax.random.key(1), (40, 8))
    c = jnp.concatenate([base, base, base], axis=0)  # 120 cands, dup x3
    s, i = chunked_topk_mips(q, c, 7, chunk_size=128)
    ref_s, ref_i = jax.lax.top_k(
        jnp.matmul(q, c.T, preferred_element_type=jnp.float32), 7
    )
    np.testing.assert_array_equal(i, ref_i)

    s2, i2 = chunked_topk_mips(q, c, 7, chunk_size=32)  # duplicates split
    np.testing.assert_array_equal(i2, ref_i)


def test_k_larger_than_n_raises():
    q = jnp.ones((2, 4))
    c = jnp.ones((5, 4))
    with pytest.raises(ValueError, match="k=9"):
        chunked_topk_mips(q, c, 9)


def test_brute_force_auto_switches_and_matches():
    key = jax.random.key(2)
    kq, kc = jax.random.split(key)
    q = jax.random.normal(kq, (8, 16))
    c = jax.random.normal(kc, (3000, 16))
    ids = jnp.arange(9_000_000, 9_003_000, dtype=jnp.int32)

    direct = BruteForceRetrieval(c, ids, k=5, chunk_size=None)
    chunked = BruteForceRetrieval(c, ids, k=5, chunk_size=512)
    s1, i1 = direct(q)
    s2, i2 = chunked(q)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)


def test_chunk_smaller_than_k_is_clamped():
    # Regression (code review): chunk_size < k used to crash in top_k.
    key = jax.random.key(3)
    q = jax.random.normal(key, (4, 16))
    c = jax.random.normal(jax.random.key(4), (300, 16))
    s, i = chunked_topk_mips(q, c, k=10, chunk_size=8)
    rs, ri = jax.lax.top_k(
        jnp.matmul(q, c.T, preferred_element_type=jnp.float32), 10
    )
    np.testing.assert_array_equal(i, ri)


def test_approx_recall_target():
    key = jax.random.key(5)
    q = jax.random.normal(key, (32, 32))
    c = jax.random.normal(jax.random.key(6), (5000, 32))
    exact_s, exact_i = chunked_topk_mips(q, c, 10, 512)
    ap_s, ap_i = chunked_topk_mips(q, c, 10, 512, recall_target=0.95)
    recall = np.mean([
        len(set(np.asarray(ap_i[b])) & set(np.asarray(exact_i[b]))) / 10
        for b in range(32)
    ])
    assert recall >= 0.9, recall
