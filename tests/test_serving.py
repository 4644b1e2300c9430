"""Serving: AOT compile and portable export/import round-trips."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_rs_tpu import serving
from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval


def _tower(x):
    w = jnp.full((8, 16), 0.05, jnp.float32)
    return jnp.tanh(x @ w)


def test_aot_compile_fixed_shapes():
    x = jnp.ones((4, 8))
    compiled = serving.aot_compile(_tower, x)
    np.testing.assert_allclose(compiled(x), _tower(x), rtol=1e-6)


def test_export_import_roundtrip():
    x = jax.random.normal(jax.random.key(0), (4, 8))
    blob = serving.export_fn(_tower, x)
    assert isinstance(blob, bytes) and len(blob) > 0
    restored = serving.import_fn(blob)
    np.testing.assert_allclose(restored(x), _tower(x), rtol=1e-6)


def test_retrieval_service_export():
    key = jax.random.key(1)
    cands = jax.random.normal(key, (500, 16))
    ids = jnp.arange(1000, 1500, dtype=jnp.int32)
    layer = BruteForceRetrieval(cands, ids, k=5)
    service = serving.make_retrieval_service(_tower, layer)

    q = jax.random.normal(jax.random.key(2), (3, 8))
    want_scores, want_ids = service(q)

    blob = serving.export_fn(service, q)
    served = serving.import_fn(blob)
    got_scores, got_ids = served(q)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_frozen_embedding_matches_training_layer():
    """freeze() serves the same activations as the sharded layer with a
    fraction of its state (no optimizer slots, no COO machinery)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from keras_rs_tpu.layers.embedding.config import (
        FeatureConfig,
        TableConfig,
    )
    from keras_rs_tpu.layers.embedding.distributed_embedding import (
        DistributedEmbedding,
    )
    from keras_rs_tpu.serving import aot_compile

    B = 16
    t = TableConfig(
        "t", 128, 16, optimizer="adagrad", combiner="mean",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    fc = FeatureConfig("f", t, (B, 3), (B, 16))
    layer = DistributedEmbedding([fc], key=jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(B, 3))
    w = rng.random((B, 3)).astype(np.float32)

    ref = jax.jit(lambda l, p: l(p))(layer, layer.preprocess({"f": ids}, {"f": w}))
    frozen = layer.freeze()
    got = frozen({"f": ids}, {"f": w})
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-6
    )

    # AOT-compiles for serving (fixed shapes, no retracing).
    compiled = aot_compile(
        lambda ids, w: frozen({"f": ids}, {"f": w}),
        jnp.asarray(ids),
        jnp.asarray(w),
    )
    out = compiled(jnp.asarray(ids), jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-6
    )
