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


def test_int8_quantized_with_reorder_recall():
    import numpy as np
    import jax, jax.numpy as jnp
    from keras_rs_tpu.layers.retrieval.kmeans_retrieval import KMeansRetrieval
    from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval

    key = jax.random.key(0)
    kc, kq = jax.random.split(key)
    N, D, B, k = 4000, 32, 64, 10
    cands = jax.random.normal(kc, (N, D))
    queries = jax.random.normal(kq, (B, D))
    exact = BruteForceRetrieval(cands, k=k)
    _, exact_ids = exact(queries)

    ivf_q = KMeansRetrieval(
        cands, k=k, num_clusters=40, num_probes=12,
        quantize="int8", reorder_k=4 * k, seed=0,
    )
    ivf_f = KMeansRetrieval(
        cands, k=k, num_clusters=40, num_probes=12, seed=0,
    )
    # index is actually int8
    assert ivf_q.cluster_candidates.dtype == jnp.int8

    def recall(ids):
        return np.mean([
            len(set(np.asarray(ids[i])) & set(np.asarray(exact_ids[i])))
            / k
            for i in range(B)
        ])

    _, ids_q = ivf_q(queries)
    _, ids_f = ivf_f(queries)
    r_q, r_f = recall(ids_q), recall(ids_f)
    # int8 + exact reorder must not lose measurable recall vs f32 IVF
    # (both are bounded by the probe routing on unclustered data).
    assert r_q >= r_f - 0.02, (r_q, r_f)
    assert r_f >= 0.6, r_f

    # reorder returns EXACT scores for the hits
    scores_q, ids_q2 = ivf_q(queries)
    full = jnp.matmul(queries, cands.T)
    got = np.asarray(scores_q[0])
    want = np.asarray(full[0])[np.asarray(ids_q2[0])]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_int8_serialization_config():
    import jax
    from keras_rs_tpu.layers.retrieval.kmeans_retrieval import KMeansRetrieval

    layer = KMeansRetrieval(
        jax.random.normal(jax.random.key(0), (100, 8)),
        k=5, quantize="int8", reorder_k=20,
    )
    cfg = layer.get_config()
    assert cfg["quantize"] == "int8" and cfg["reorder_k"] == 20
    rebuilt = KMeansRetrieval(**{**cfg, "name": None})
    assert rebuilt.quantize == "int8"
