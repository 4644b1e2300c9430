"""KMeansRetrieval (IVF) recall tests against exact brute force."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_rs_tpu.layers.retrieval.kmeans_retrieval import (
    KMeansRetrieval,
    kmeans,
)
from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval


def test_kmeans_converges_on_blobs():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4, 8)) * 5
    points = np.concatenate(
        [c + rng.normal(size=(50, 8)) * 0.1 for c in centers]
    ).astype(np.float32)
    got = np.asarray(
        kmeans(jnp.asarray(points), 4, key=jax.random.key(1))
    )
    # Every true center should be close to some learned centroid.
    d = np.linalg.norm(centers[:, None] - got[None], axis=-1).min(axis=1)
    assert (d < 0.5).all(), d


def test_ivf_recall_vs_brute_force():
    rng = np.random.default_rng(1)
    candidates = rng.normal(size=(2000, 16)).astype(np.float32)
    queries = rng.normal(size=(32, 16)).astype(np.float32)

    bf = BruteForceRetrieval(jnp.asarray(candidates), k=10)
    _, exact_ids = bf(jnp.asarray(queries))
    exact = np.asarray(exact_ids)

    ann = KMeansRetrieval(
        jnp.asarray(candidates), k=10, num_clusters=40, num_probes=10
    )
    _, approx_ids = ann(jnp.asarray(queries))
    approx = np.asarray(approx_ids)

    recall = np.mean(
        [
            len(set(a) & set(e)) / len(e)
            for a, e in zip(approx, exact)
        ]
    )
    assert recall > 0.8, recall


def test_ivf_full_probe_is_exact():
    rng = np.random.default_rng(2)
    candidates = rng.normal(size=(300, 8)).astype(np.float32)
    queries = rng.normal(size=(8, 8)).astype(np.float32)
    bf = BruteForceRetrieval(jnp.asarray(candidates), k=5)
    _, exact_ids = bf(jnp.asarray(queries))
    ann = KMeansRetrieval(
        jnp.asarray(candidates), k=5, num_clusters=10, num_probes=10
    )
    _, ids = ann(jnp.asarray(queries))
    np.testing.assert_array_equal(
        np.sort(np.asarray(ids)), np.sort(np.asarray(exact_ids))
    )


def test_ivf_custom_ids_and_jit():
    rng = np.random.default_rng(3)
    candidates = rng.normal(size=(100, 4)).astype(np.float32)
    # Unit-normalize so each candidate's own dot product is maximal.
    candidates /= np.linalg.norm(candidates, axis=1, keepdims=True)
    ids = np.arange(100)[::-1].copy()
    ann = KMeansRetrieval(
        jnp.asarray(candidates), jnp.asarray(ids), k=3,
        num_clusters=5, num_probes=5,
    )
    out = jax.jit(lambda q: ann(q))(jnp.asarray(candidates[:4]))
    scores, top_ids = out
    # Query = candidate i: with full probing its own id must be in top-3.
    for i in range(4):
        assert ids[i] in np.asarray(top_ids)[i]
