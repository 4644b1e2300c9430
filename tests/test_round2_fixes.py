"""Round-2 debt fixes: sharded retrieval, stats merging, auto-grow,
structural input matching, evaluate(), serialization completeness.

Reference anchors cited per test.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)
from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval
from keras_rs_tpu.parallel import multihost
from keras_rs_tpu.parallel.sharded_retrieval import (
    ShardedBruteForceRetrieval,
)


# ---------------------------------------------------------------------------
# ShardedBruteForceRetrieval
# ---------------------------------------------------------------------------
class TestShardedRetrieval:
    def _data(self, n, d=16, b=8, seed=0):
        rng = np.random.default_rng(seed)
        cands = rng.normal(size=(n, d)).astype(np.float32)
        queries = rng.normal(size=(b, d)).astype(np.float32)
        return queries, cands

    @pytest.mark.parametrize("n", [64, 100, 1000])  # 100: not /8
    def test_matches_single_device_brute_force(self, n):
        queries, cands = self._data(n)
        ref = BruteForceRetrieval(cands, k=10, chunk_size=None)
        ref_s, ref_i = ref(queries)
        sharded = ShardedBruteForceRetrieval(cands, k=10)
        s, i = sharded(queries)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(ref_s), rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    def test_candidate_ids_mapping(self):
        queries, cands = self._data(64)
        ids = np.arange(64, dtype=np.int32) * 7 + 3
        layer = ShardedBruteForceRetrieval(cands, candidate_ids=ids, k=5)
        _, top = layer(queries)
        ref = BruteForceRetrieval(cands, candidate_ids=ids, k=5)
        _, ref_top = ref(queries)
        np.testing.assert_array_equal(np.asarray(top), np.asarray(ref_top))

    def test_padding_rows_never_win(self):
        # 9 candidates on 8 shards -> 7 padding rows of zeros. Queries
        # with all-negative scores would otherwise select the 0-score pads.
        rng = np.random.default_rng(1)
        cands = -np.abs(rng.normal(size=(9, 8))).astype(np.float32)
        queries = np.abs(rng.normal(size=(4, 8))).astype(np.float32)
        layer = ShardedBruteForceRetrieval(cands, k=9)
        _, idx = layer(queries)
        assert int(np.asarray(idx).max()) < 9


# ---------------------------------------------------------------------------
# multihost stats merge
# ---------------------------------------------------------------------------
def test_sync_stats_sums_dropped_and_maxes_capacities():
    # Single process: gather returns [1, k]; semantic check is that the
    # reduction picks sum for dropped_ids and max elsewhere.
    out = multihost.sync_max_stats(
        {"max_ids_per_bucket": 7, "max_unique_per_shard": 3, "dropped_ids": 5}
    )
    assert out == {
        "max_ids_per_bucket": 7,
        "max_unique_per_shard": 3,
        "dropped_ids": 5,
    }
    local = np.asarray([4, 10], np.int64)

    # Simulate 2 hosts by monkey-patching the gather.
    orig = multihost.process_allgather
    try:
        multihost.process_allgather = lambda x: np.stack([x, x + 1])
        merged = multihost.sync_max_stats(
            {"dropped_ids": 4, "max_ids_per_bucket": 10}
        )
    finally:
        multihost.process_allgather = orig
    assert merged["dropped_ids"] == 4 + 5  # summed
    assert merged["max_ids_per_bucket"] == 11  # maxed
    del local


# ---------------------------------------------------------------------------
# DistributedEmbedding: structure check, auto-grow, record_stats, config
# ---------------------------------------------------------------------------
B = 16


def make_layer(**kwargs):
    t = TableConfig(
        "t", 100, 8, optimizer="sgd", combiner="sum", placement="sharded",
        max_ids_per_partition=4, max_unique_ids_per_partition=4,
    )
    fc = FeatureConfig("f", t, (B, 4), (B, 8))
    return DistributedEmbedding([fc], key=jax.random.key(0), **kwargs)


def make_two_feature_layer(**kwargs):
    t = TableConfig(
        "t", 100, 8, optimizer="sgd", combiner="sum", placement="sharded",
        max_ids_per_partition=64, max_unique_ids_per_partition=64,
    )
    fa = FeatureConfig("a", t, (B, 4), (B, 8))
    fb = FeatureConfig("b", t, (B, 4), (B, 8))
    return DistributedEmbedding(
        {"a": fa, "b": fb}, key=jax.random.key(0), **kwargs
    )


class TestMatchFeaturesStructure:
    def test_wrong_structure_same_leaf_count_raises(self):
        layer = make_two_feature_layer()
        ids = np.zeros((B, 4), np.int64)
        # A list (different treedef than the configured dict) must not
        # silently bind leaves positionally.
        with pytest.raises(ValueError, match="structure"):
            layer.preprocess([ids, ids])

    def test_matching_dict_ok(self):
        layer = make_two_feature_layer()
        ids = np.zeros((B, 4), np.int64)
        layer.preprocess({"a": ids, "b": ids})

    def test_bare_leaf_ok_for_single_feature(self):
        layer = make_layer()
        layer.preprocess(np.zeros((B, 4), np.int64))


class TestAutoGrow:
    def test_training_overflow_grows_and_drops_nothing(self):
        """Parity: jax/distributed_embedding.py:658-719 — observed ids
        exceeding configured limits must not be dropped in training."""
        layer = make_layer(auto_grow=True)
        stack0 = layer.stacks[0]
        assert stack0.max_ids_per_partition == 4
        # Heavy skew: every entry hits shard 7 -> (src, dst=7) buckets
        # hold 8 entries each, far over the capacity of 4.
        ids = np.full((B, 4), 7, np.int64)
        ids[:, 1] = (np.arange(B) % 5) * 8 + 7
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no drop warnings allowed
            pre = layer.preprocess({"f": ids}, training=True)
        grown = layer.stacks[0]
        assert grown.max_ids_per_partition > 4
        # Observed stats recorded; zero drops after the regrow.
        st = layer.input_stats[grown.name]
        assert st.dropped_ids == 0
        # Lookup runs at the grown shapes and every id contributed:
        # with combiner=sum and an all-ones table the activation row sums
        # to valence * 1 only if nothing was dropped.
        layer.set_embedding_tables({"t": np.ones((100, 8), np.float32)})
        acts = jax.jit(lambda l, p: l(p))(layer, pre)
        np.testing.assert_allclose(np.asarray(acts[0]), 4.0)

    def test_auto_grow_off_warns_and_drops(self):
        layer = make_layer(auto_grow=False)
        ids = np.full((B, 4), 7, np.int64)
        with pytest.warns(UserWarning):
            layer.preprocess({"f": ids}, training=True)
        st = list(layer.input_stats.values())[0]
        assert st.dropped_ids > 0

    def test_inference_never_grows(self):
        layer = make_layer(auto_grow=True)
        ids = np.full((B, 4), 7, np.int64)
        with pytest.warns(UserWarning):
            layer.preprocess({"f": ids}, training=False)
        assert layer.stacks[0].max_ids_per_partition == 4


class TestRecordStats:
    def test_device_stats_fold_into_update_stats(self):
        layer = make_layer(auto_grow=False)
        name = layer.stacks[0].name
        from keras_rs_tpu.layers.embedding.device_preprocessing import (
            DeviceStats,
        )

        layer.record_stats(
            {
                name: DeviceStats(
                    max_ids_per_bucket=jnp.asarray(9),
                    max_unique_per_shard=jnp.asarray(6),
                    dropped_ids=jnp.asarray(2),
                )
            }
        )
        layer.record_stats(
            {
                name: DeviceStats(
                    max_ids_per_bucket=jnp.asarray(5),
                    max_unique_per_shard=jnp.asarray(8),
                    dropped_ids=jnp.asarray(1),
                )
            }
        )
        st = layer.input_stats[name]
        assert st.max_ids_per_bucket == 9
        assert st.max_unique_per_shard == 8
        assert st.dropped_ids == 3  # additive
        with pytest.warns(UserWarning):
            synced = layer.update_stats()
        assert layer.rebuild_capacities(synced=synced)
        assert layer.stacks[0].max_ids_per_partition >= 9


class TestSerializationCompleteness:
    def test_round_trip_restores_stacking_dtype_and_axes(self):
        t1 = TableConfig(
            "t1", 64, 8, optimizer="sgd", placement="sharded",
            dtype="bfloat16",
        )
        t2 = TableConfig(
            "t2", 32, 8, optimizer="sgd", placement="sharded",
            dtype="bfloat16",
        )
        fcs = [
            FeatureConfig("f1", t1, (B,), (B, 8)),
            FeatureConfig("f2", t2, (B,), (B, 8)),
            FeatureConfig("f1b", t1, (B,), (B, 8)),  # shared table
        ]
        layer = DistributedEmbedding(
            fcs,
            key=jax.random.key(0),
            table_stacking=[["t1", "t2"]],
            auto_grow=False,
        )
        cfg = layer.get_config()
        assert cfg["table_stacking"] == [["t1", "t2"]]
        assert cfg["auto_grow"] is False
        restored = DistributedEmbedding.from_config(cfg)
        # Same stacking decision -> same stack layout.
        assert [s.name for s in restored.stacks] == [
            s.name for s in layer.stacks
        ]
        assert restored.stacks[0].dtype == "bfloat16"
        assert restored.auto_grow is False
        assert restored.axis_name == layer.axis_name
        # Shared-table dedup survived.
        assert (
            restored._feature_leaves[0].table
            is restored._feature_leaves[2].table
        )
        # Table values transplant bit-exactly through the exchange format.
        restored.set_embedding_tables(layer.get_embedding_tables())
        ids = {"f1": np.arange(B) % 64, "f2": np.arange(B) % 32,
               "f1b": np.arange(B) % 64}
        a = jax.jit(lambda l, p: l(p))(layer, layer.preprocess(ids))
        b = jax.jit(lambda l, p: l(p))(restored, restored.preprocess(ids))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# Trainer.evaluate
# ---------------------------------------------------------------------------
class TestEvaluate:
    def _trainer(self):
        from keras_rs_tpu.layers.dense import Dense
        from keras_rs_tpu.training.trainer import Trainer

        model = Dense(4, 1, key=jax.random.key(0))

        def loss_fn(model, batch):
            x, y = batch
            pred = model(x)[:, 0]
            return jnp.mean((pred - y) ** 2)

        return Trainer(model, optax.sgd(0.1), loss_fn)

    def test_reports_loss_and_metrics(self):
        from keras_rs_tpu.metrics.classification import BinaryAccuracy

        trainer = self._trainer()
        rng = np.random.default_rng(0)
        batches = [
            (
                rng.normal(size=(8, 4)).astype(np.float32),
                rng.integers(0, 2, size=(8,)).astype(np.float32),
            )
            for _ in range(3)
        ]
        out = trainer.evaluate(
            batches,
            metric_fns={"acc": BinaryAccuracy()},
            eval_fn=lambda model, batch: (batch[1], model(batch[0])[:, 0]),
        )
        assert set(out) == {"acc", "loss"}
        assert np.isfinite(out["loss"])
        # Loss agrees with a direct computation.
        direct = float(
            np.mean(
                [float(trainer.loss_fn(trainer.model, b)) for b in batches]
            )
        )
        np.testing.assert_allclose(out["loss"], direct, rtol=1e-5)

    def test_sample_weight_threads_through(self):
        from keras_rs_tpu.metrics.classification import BinaryAccuracy

        trainer = self._trainer()
        x = np.zeros((4, 4), np.float32)
        y = np.asarray([1.0, 1.0, 0.0, 0.0], np.float32)
        # Predictions are model(0) = bias -> constant; weight out the
        # second half so accuracy is decided by the first two rows only.
        w = np.asarray([1.0, 1.0, 0.0, 0.0], np.float32)
        out = trainer.evaluate(
            [(x, y)],
            metric_fns={"acc": BinaryAccuracy()},
            eval_fn=lambda model, batch: (
                batch[1],
                jnp.ones((4,)),
                w,
            ),
            report_loss=False,
        )
        assert out["acc"] == 1.0

    def test_empty_dataset_raises(self):
        trainer = self._trainer()
        with pytest.raises(ValueError, match="empty"):
            trainer.evaluate([])


# ---------------------------------------------------------------------------
# Retrieval chunked-path compute_score guard
# ---------------------------------------------------------------------------
class TestChunkedScoreGuard:
    class Cosine(BruteForceRetrieval):
        def compute_score(self, q, c):
            qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            cn = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
            return jnp.matmul(qn, cn.T)

    def test_auto_falls_back_to_direct_for_custom_score(self):
        rng = np.random.default_rng(0)
        cands = rng.normal(size=(64, 8)).astype(np.float32)
        layer = self.Cosine(cands, k=4)
        layer.DIRECT_MAX_CANDIDATES = 16  # force "would chunk" regime
        s, i = layer(rng.normal(size=(4, 8)).astype(np.float32))
        # Cosine scores are <= 1; the dot-product chunked path would
        # return unnormalized scores > 1 for these magnitudes.
        assert float(np.max(np.asarray(s))) <= 1.0 + 1e-5

    def test_explicit_chunk_size_with_custom_score_raises(self):
        rng = np.random.default_rng(0)
        cands = rng.normal(size=(64, 8)).astype(np.float32)
        layer = self.Cosine(cands, k=4, chunk_size=16)
        with pytest.raises(ValueError, match="dot-product"):
            layer(rng.normal(size=(4, 8)).astype(np.float32))


class TestPackedStateCheckpoint:
    def test_packed_3d_state_orbax_round_trip(self, tmp_path):
        """The 3-D packed table+slot state must round-trip bit-exactly
        through Orbax with its row sharding intact."""
        from keras_rs_tpu.training.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        t = TableConfig(
            "t", 256, 128, optimizer="adam", combiner="sum",
            placement="sharded", max_ids_per_partition=64,
            max_unique_ids_per_partition=64,
        )
        fc = FeatureConfig("f", t, (B, 2), (B, 128))
        layer = DistributedEmbedding([fc], key=jax.random.key(3))
        stack = layer.stacks[0]
        assert stack.packed_state and stack.state_stride == 3  # adam
        state = layer.state.value[stack.name]
        assert state["table"].ndim == 3

        save_checkpoint(str(tmp_path / "ckpt"), state)
        restored = restore_checkpoint(str(tmp_path / "ckpt"), state)
        np.testing.assert_array_equal(
            np.asarray(state["table"]), np.asarray(restored["table"])
        )
        assert (
            restored["table"].sharding == state["table"].sharding
        )
