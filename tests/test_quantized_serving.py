"""Int8 per-row-quantized serving tables (ops/quant.py,
QuantizedEmbedReduce, freeze(quantize="int8")).

Beyond the reference's surface (it has no quantized serving path);
the quantization scheme matches the int8 asymmetric-hashing store in
layers/retrieval/kmeans_retrieval.py. The error contract under test:
per element |dequant - x| <= row_absmax / 254.
"""

import jax
import jax.numpy as jnp
import numpy as np

from keras_rs_tpu import serving
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)
from keras_rs_tpu.layers.embedding.embed_reduce import (
    EmbedReduce,
    QuantizedEmbedReduce,
)
from keras_rs_tpu.ops.quant import dequantize_rows, quantize_rows_int8


def test_quantize_rows_error_bound():
    rng = np.random.default_rng(0)
    # Mixed row magnitudes (embedding tables are heavy-tailed) + a zero
    # row and a single-element spike row.
    x = rng.normal(size=(64, 32)).astype(np.float32)
    x *= rng.lognormal(sigma=2.0, size=(64, 1)).astype(np.float32)
    x[7] = 0.0
    x[9] = 0.0
    x[9, 3] = 1e-6
    q, scale = quantize_rows_int8(x)
    assert q.dtype == jnp.int8 and scale.shape == (64, 1)
    deq = np.asarray(dequantize_rows(q, scale), np.float64)
    absmax = np.abs(x).max(axis=1, keepdims=True).astype(np.float64)
    err = np.abs(deq - x.astype(np.float64))
    # <= (not <): exact half-ulp inputs tie the bound under
    # round-half-even; tiny relative slack for the f32 scale rounding.
    bound = absmax / 254 * (1 + 1e-5) + 1e-12
    assert (err <= bound).all(), (err / np.maximum(bound, 1e-30)).max()
    # Zero rows reconstruct exactly.
    np.testing.assert_array_equal(deq[7], 0.0)


def test_quantized_embed_reduce_matches_f32():
    rng = np.random.default_rng(1)
    table = rng.normal(size=(100, 16)).astype(np.float32)
    ids2d = rng.integers(0, 100, size=(8, 5))
    w2d = rng.random((8, 5)).astype(np.float32)
    ids1d = rng.integers(0, 100, size=(8,))
    for combiner in ("mean", "sum", "sqrtn"):
        er = EmbedReduce(100, 16, table=table, combiner=combiner)
        qer = er.quantize_int8()
        assert isinstance(qer, QuantizedEmbedReduce)
        for args in [(ids2d, w2d), (ids2d, None), (ids1d, None)]:
            want = np.asarray(er(*args))
            got = np.asarray(qer(*args))
            # Row error <= absmax/254 ~ 0.4% of the scale of each row.
            np.testing.assert_allclose(got, want, atol=np.abs(
                table
            ).max() / 100, rtol=0.02)


def test_quantized_reducer_jit_and_memory():
    table = np.random.default_rng(2).normal(size=(256, 32)).astype(
        np.float32
    )
    qer = QuantizedEmbedReduce.from_table(table, combiner="mean")
    # 4x smaller row payload (+ one f32 scale per row).
    assert qer.q.nbytes == table.nbytes // 4
    assert qer.scale.nbytes == 256 * 4
    ids = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    out = jax.jit(lambda m, i: m(i))(qer, ids)
    assert out.shape == (2, 32) and bool(jnp.isfinite(out).all())


def test_freeze_int8_matches_f32_freeze():
    B = 16
    t = TableConfig(
        "t", 128, 16, optimizer="adagrad", combiner="mean",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    t2 = TableConfig(
        "t2", 64, 8, optimizer="adagrad", combiner="sum",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    fcs = {
        "f": FeatureConfig("f", t, (B, 3), (B, 16)),
        # Shared table: g and h must reference the SAME (q, scale).
        "g": FeatureConfig("g", t2, (B, 2), (B, 8)),
        "h": FeatureConfig("h", t2, (B, 2), (B, 8)),
    }
    layer = DistributedEmbedding(fcs, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    inputs = {
        "f": rng.integers(0, 128, size=(B, 3)),
        "g": rng.integers(0, 64, size=(B, 2)),
        "h": rng.integers(0, 64, size=(B, 2)),
    }

    frozen = layer.freeze()
    quantized = layer.freeze(quantize="int8")
    want = frozen(inputs)
    got = quantized(inputs)
    for k in inputs:
        w = np.asarray(want[k])
        g = np.asarray(got[k])
        np.testing.assert_allclose(g, w, atol=np.abs(w).max() * 0.02 + 1e-4)
    # Shared-table features hold the same quantized buffers.
    qg = quantized._reducers["g"]
    qh = quantized._reducers["h"]
    assert qg.q is qh.q and qg.scale is qh.scale
    # Export view still yields logical [vocab, dim] f32 tables.
    tables = quantized.tables
    assert tables["t"].shape == (128, 16)
    assert tables["t2"].shape == (64, 8)


def test_freeze_int8_export_roundtrip_and_size():
    B = 8
    t = TableConfig(
        "t", 512, 32, optimizer="sgd", combiner="mean",
        placement="sharded", max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    fc = FeatureConfig("f", t, (B, 4), (B, 32))
    layer = DistributedEmbedding([fc], key=jax.random.key(3))
    frozen = layer.freeze()
    quantized = layer.freeze(quantize="int8")

    ids = jnp.asarray(
        np.random.default_rng(4).integers(0, 512, size=(B, 4))
    )
    blob_f32 = serving.export_fn(lambda i: frozen({"f": i})[0], ids)
    blob_int8 = serving.export_fn(lambda i: quantized({"f": i})[0], ids)
    # Tables are baked into the artifact: the int8 one ships ~4x less
    # table payload (shared overhead keeps the ratio below exactly 4).
    assert len(blob_int8) < 0.45 * len(blob_f32), (
        len(blob_int8), len(blob_f32),
    )
    served = serving.import_fn(blob_int8)
    np.testing.assert_allclose(
        np.asarray(served(ids)),
        np.asarray(quantized({"f": ids})[0]),
        rtol=1e-6,
    )


def test_freeze_rejects_unknown_quantize():
    t = TableConfig(
        "t", 128, 8, optimizer="sgd", combiner="mean",
        placement="sharded", max_ids_per_partition=16,
        max_unique_ids_per_partition=16,
    )
    fc = FeatureConfig("f", t, (8, 2), (8, 8))
    layer = DistributedEmbedding([fc], key=jax.random.key(0))
    try:
        layer.freeze(quantize="int4")
    except ValueError as e:
        assert "int8" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_embed_reduce_config_roundtrip():
    from keras_rs_tpu.core import serialization

    er = EmbedReduce(
        12, 4, key=jax.random.key(0), combiner="sqrtn", name="er"
    )
    er2 = serialization.deserialize(serialization.serialize(er))
    # Architecture round-trips (weights come from checkpoints).
    assert isinstance(er2, EmbedReduce)
    assert (er2.input_dim, er2.output_dim) == (12, 4)
    assert er2.combiner == "sqrtn" and er2.name == "er"
    assert er2.embeddings.shape == er.embeddings.shape


def test_quantized_embed_reduce_config_roundtrip():
    from keras_rs_tpu.core import serialization

    table = np.random.default_rng(0).normal(size=(10, 8)).astype(
        np.float32
    )
    q = QuantizedEmbedReduce.from_table(
        table, combiner="sum", name="qer"
    )
    q2 = serialization.deserialize(serialization.serialize(q))
    assert isinstance(q2, QuantizedEmbedReduce)
    assert (q2.input_dim, q2.output_dim) == (10, 8)
    assert q2.combiner == "sum" and q2.name == "qer"
    # Placeholder weights have the right shapes/dtypes for checkpoint
    # restore (jax.tree_util-compatible with the original).
    assert q2.q.shape == q.q.shape and q2.q.dtype == jnp.int8
    assert q2.scale.shape == q.scale.shape


def test_packed_layout_bit_identical_to_rows():
    """The group-packed word-typed layout (round-4, VERDICT r3 #8) must
    produce bit-identical lookups to the 'rows' layout, including at
    R % 4 != 0 (zero-row padding) and multi-dim ids."""
    rng = np.random.default_rng(3)
    for R in (101, 64):
        table = rng.normal(size=(R, 16)).astype(np.float32)
        ids2d = rng.integers(0, R, size=(8, 5))
        w2d = rng.random((8, 5)).astype(np.float32)
        ids1d = rng.integers(0, R, size=(32,))
        for combiner in ("mean", "sum", "sqrtn"):
            er = EmbedReduce(R, 16, table=table, combiner=combiner)
            q_rows = er.quantize_int8()
            q_packed = er.quantize_int8(layout="packed")
            assert q_packed.layout == "packed"
            # 1 byte/element + 4 B/row scale, padded to a 4-row group.
            assert q_packed.qp.dtype == jnp.int32
            assert q_packed.qp.shape == ((R + 3) // 4, 16)
            for args in [(ids2d, w2d), (ids2d, None), (ids1d, None)]:
                want = np.asarray(q_rows(*args))
                got = np.asarray(q_packed(*args))
                np.testing.assert_array_equal(got, want)
            # Export view identical too.
            np.testing.assert_array_equal(
                np.asarray(q_packed.embeddings),
                np.asarray(q_rows.embeddings),
            )


def test_packed_layout_config_roundtrip_and_pytree():
    rng = np.random.default_rng(4)
    table = rng.normal(size=(37, 8)).astype(np.float32)
    qer = QuantizedEmbedReduce.from_table(table, layout="packed")
    cfg = qer.get_config()
    assert cfg["layout"] == "packed"
    rebuilt = QuantizedEmbedReduce.from_config(cfg)
    assert rebuilt.layout == "packed"
    assert rebuilt.qp.shape == qer.qp.shape
    assert rebuilt.scale.shape == qer.scale.shape
    # Pytree leaves transplant (checkpoint restore pattern).
    leaves, treedef = jax.tree_util.tree_flatten(qer)
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    ids = rng.integers(0, 37, size=(16,))
    np.testing.assert_array_equal(
        np.asarray(restored(ids)), np.asarray(qer(ids))
    )


def test_freeze_int8_packed_matches_int8():
    table_a = TableConfig(
        name="ta", vocabulary_size=50, embedding_dim=8, combiner="mean"
    )
    feats = {
        "f1": FeatureConfig(
            name="f1", table=table_a,
            input_shape=(8, 3), output_shape=(8, 8),
        ),
        # Shared table: both features must reference the SAME packed
        # arrays (no per-feature HBM copy).
        "f2": FeatureConfig(
            name="f2", table=table_a,
            input_shape=(8,), output_shape=(8, 8),
        ),
    }
    layer = DistributedEmbedding(feats, key=jax.random.key(0))
    rng = np.random.default_rng(5)
    inputs = {
        "f1": rng.integers(0, 50, size=(8, 3)),
        "f2": rng.integers(0, 50, size=(8,)),
    }
    frozen8 = layer.freeze(quantize="int8")
    frozenp = layer.freeze(quantize="int8_packed")
    out8 = frozen8(inputs)
    outp = frozenp(inputs)
    for k in out8:
        np.testing.assert_array_equal(
            np.asarray(outp[k]), np.asarray(out8[k])
        )
    rp = frozenp._reducers
    assert rp["f1"].qp is rp["f2"].qp, "shared table was re-packed"


# --- fused int8+scale layout (round 5) -----------------------------------


def test_fused_pack_roundtrip():
    from keras_rs_tpu.ops.quant import (
        pack_rows_int8_fused,
        unpack_rows_int8_fused,
    )

    rng = np.random.default_rng(11)
    R = 37  # exercises the pad-to-8 path
    q = rng.integers(-127, 128, size=(R, 128), dtype=np.int8)
    scale = (rng.random(R, dtype=np.float32) + 0.5) / 127.0
    packed = pack_rows_int8_fused(jnp.asarray(q), jnp.asarray(scale))
    assert packed.shape == ((R + 7) // 8, 384)
    q2, s2 = unpack_rows_int8_fused(packed, R)
    np.testing.assert_array_equal(np.asarray(q2), q)
    np.testing.assert_array_equal(np.asarray(s2), scale)


def test_fused_take_bit_identical_to_rows():
    from keras_rs_tpu.ops.quant import (
        pack_rows_int8_fused,
        take_rows_int8_fused,
    )

    rng = np.random.default_rng(12)
    R, N = 1000, 333
    q = rng.integers(-127, 128, size=(R, 128), dtype=np.int8)
    scale = (rng.random(R, dtype=np.float32) + 0.5) / 127.0
    ids = rng.integers(0, R, size=(N,)).astype(np.int32)
    want = q[ids].astype(np.float32) * scale[ids][:, None]
    packed = pack_rows_int8_fused(jnp.asarray(q), jnp.asarray(scale))
    got = np.asarray(take_rows_int8_fused(packed, jnp.asarray(ids)))
    np.testing.assert_array_equal(got, want)
    # 2-D id shapes keep their leading shape.
    got2 = np.asarray(
        take_rows_int8_fused(packed, jnp.asarray(ids.reshape(3, 111)))
    )
    assert got2.shape == (3, 111, 128)
    np.testing.assert_array_equal(got2.reshape(N, 128), want)


def test_freeze_int8_fused_matches_int8():
    import jax

    from keras_rs_tpu.layers.embedding.config import (
        FeatureConfig,
        TableConfig,
    )
    from keras_rs_tpu.layers.embedding.distributed_embedding import (
        DistributedEmbedding,
    )

    table_a = TableConfig(
        name="a", vocabulary_size=50, embedding_dim=128, combiner="mean"
    )
    table_b = TableConfig(
        name="b", vocabulary_size=30, embedding_dim=16, combiner="sum"
    )
    feats = {
        "f1": FeatureConfig(
            name="f1", table=table_a,
            input_shape=(8, 3), output_shape=(8, 128),
        ),
        "f2": FeatureConfig(
            name="f2", table=table_a,
            input_shape=(8,), output_shape=(8, 128),
        ),
        # dim != 128: must fall back to the rows layout inside the
        # fused freeze.
        "f3": FeatureConfig(
            name="f3", table=table_b,
            input_shape=(8, 2), output_shape=(8, 16),
        ),
    }
    layer = DistributedEmbedding(feats, key=jax.random.key(0))
    rng = np.random.default_rng(5)
    inputs = {
        "f1": rng.integers(0, 50, size=(8, 3)),
        "f2": rng.integers(0, 50, size=(8,)),
        "f3": rng.integers(0, 30, size=(8, 2)),
    }
    out8 = layer.freeze(quantize="int8")(inputs)
    frozenf = layer.freeze(quantize="int8_fused")
    outf = frozenf(inputs)
    for k in out8:
        np.testing.assert_array_equal(
            np.asarray(outf[k]), np.asarray(out8[k]), err_msg=k
        )
    rf = frozenf._reducers
    assert rf["f1"].layout == "fused"
    assert rf["f1"].qp is rf["f2"].qp, "shared table was re-packed"
    assert rf["f3"].layout == "rows"
