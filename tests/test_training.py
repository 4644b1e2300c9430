"""End-to-end training slice: the `basic_ranking` / `basic_retrieval`
equivalents (SURVEY.md §7 step 4) — jitted train step, loss decreases,
checkpoint round-trip, retrieval eval.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import metrics, models, training
from keras_rs_tpu.data import synthetic


def test_basic_ranking_learns():
    data = synthetic.movielens_like(num_examples=4096, seed=0)
    model = models.BasicRanking(
        num_users=200, num_items=100, embedding_dim=16,
        hidden_units=(64, 16, 1), key=jax.random.key(0),
    )
    trainer = training.Trainer(
        model, optax.adagrad(0.1), models.mse_loss
    )
    first = trainer.fit(
        synthetic.batches(data, 256, seed=1), epochs=1, log_every=0
    )["loss"][0]
    last = trainer.fit(
        lambda: synthetic.batches(data, 256, seed=5), epochs=3, log_every=0
    )["loss"][-1]
    assert last < first * 0.8, (first, last)


def test_two_tower_in_batch_softmax_learns():
    rng = np.random.default_rng(0)
    n = 2048
    # Each user has a preferred item: item = user % num_items.
    user_ids = rng.integers(0, 64, size=n).astype(np.int32)
    item_ids = (user_ids % 32).astype(np.int32)
    model = models.TwoTower(64, 32, 16, key=jax.random.key(0))

    def loss_fn(model, batch):
        return models.in_batch_softmax_loss(
            model, batch["user_id"], batch["item_id"]
        )

    trainer = training.Trainer(model, optax.adam(0.05), loss_fn)
    data = {"user_id": user_ids, "item_id": item_ids}
    hist = trainer.fit(
        lambda: synthetic.batches(data, 128, seed=2), epochs=5, log_every=0
    )
    assert hist["loss"][-1] < hist["loss"][0] * 0.5

    # Retrieval head: top-1 items should be each user's preferred item.
    retrieval = trainer.model.make_retrieval(k=1)
    queries = trainer.model.query_tower(jnp.arange(64))
    _, top = retrieval(queries)
    accuracy = float(np.mean(np.asarray(top)[:, 0] == (np.arange(64) % 32)))
    assert accuracy > 0.9, accuracy


def test_recall_metric_on_retrieval():
    model = models.TwoTower(16, 8, 4, key=jax.random.key(1))
    scores = model.in_batch_scores(jnp.arange(8), jnp.arange(8))
    labels = jnp.eye(8)
    m = metrics.RecallAtK(k=4, shuffle_ties=False)
    m.update_state(labels, scores)
    assert 0.0 <= float(m.result()) <= 1.0


def test_checkpoint_roundtrip():
    model = models.BasicRanking(
        num_users=20, num_items=10, embedding_dim=4,
        hidden_units=(8, 1), key=jax.random.key(0),
    )
    state = training.create_train_state(model, optax.adam(1e-3))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        training.save_checkpoint(path, state)
        restored = training.restore_checkpoint(path, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_non_trainable_leaves_not_updated():
    from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval
    from keras_rs_tpu.core.module import Module

    class WithBuffer(Module):
        non_trainable_fields = ("frozen",)

        def __init__(self):
            self.w = jnp.ones((3,))
            self.frozen = jnp.ones((3,))

    m = WithBuffer()
    step = training.make_train_step(
        lambda m, b: jnp.sum((m.w + m.frozen) ** 2), optax.sgd(0.1),
        donate=False,
    )
    state = training.create_train_state(m, optax.sgd(0.1))
    new_state, _ = step(state, None)
    assert not np.allclose(np.asarray(new_state.model.w), 1.0)
    np.testing.assert_allclose(np.asarray(new_state.model.frozen), 1.0)
    del BruteForceRetrieval


def test_overwrite_contract():
    from keras_rs_tpu.core.module import Module
    from keras_rs_tpu.training.train_state import Overwrite

    class Toy(Module):
        def __init__(self):
            self.w = jnp.ones((2,))
            self.table = Overwrite(jnp.ones((2,)))

    # Loss engineered so d(loss)/d(table.value) == target: the Overwrite
    # contract says the leaf is ASSIGNED that cotangent.
    target = jnp.array([5.0, -3.0])

    def loss_fn(m, _):
        return jnp.sum(m.table.value * target) + jnp.sum(m.w**2)

    m = Toy()
    state = training.create_train_state(m, optax.sgd(0.5))
    step = training.make_train_step(loss_fn, optax.sgd(0.5), donate=False)
    new_state, _ = step(state, None)
    np.testing.assert_allclose(
        np.asarray(new_state.model.table.value), np.asarray(target)
    )
    # w got a normal sgd update: w - 0.5 * 2w = 0.
    np.testing.assert_allclose(np.asarray(new_state.model.w), 0.0)


def test_checkpoint_resume_training_continuity(tmp_path):
    """Train -> checkpoint -> keep training vs restore -> resume must
    produce identical losses, including the sharded embedding's fused
    optimizer slots and step counter."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from keras_rs_tpu import training
    from keras_rs_tpu.layers.embedding.config import (
        FeatureConfig,
        TableConfig,
    )
    from keras_rs_tpu.layers.embedding.distributed_embedding import (
        DistributedEmbedding,
    )
    from keras_rs_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.create_mesh()
    table = TableConfig(
        name="t", vocabulary_size=211, embedding_dim=8, combiner="mean",
        placement="sharded", optimizer="adam",
        max_ids_per_partition=64, max_unique_ids_per_partition=64,
    )
    fc = FeatureConfig(name="f", table=table, input_shape=(16, 3),
                       output_shape=(16, 8))
    layer = DistributedEmbedding({"f": fc}, key=jax.random.key(0),
                                 mesh=mesh)
    rng = np.random.default_rng(0)
    batches = [
        {
            "ids": jnp.asarray(rng.integers(0, 211, (16, 3))),
            "y": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
        }
        for _ in range(10)
    ]

    def loss_fn(m, b):
        acts = m(m.preprocess_on_device({"f": b["ids"]}))["f"]
        return jnp.mean((acts - b["y"]) ** 2)

    opt = optax.adam(0.05)
    step = training.make_train_step(loss_fn, opt, donate=False)

    state = training.create_train_state(layer, opt)
    for b in batches[:5]:
        state, _ = step(state, b)
    path = str(tmp_path / "ckpt")
    training.save_checkpoint(path, state)

    # Branch A: continue in-memory.
    state_a, losses_a = state, []
    for b in batches[5:]:
        state_a, loss = step(state_a, b)
        losses_a.append(float(loss))

    # Branch B: restore from disk and resume.
    fresh = training.create_train_state(
        DistributedEmbedding({"f": fc}, key=jax.random.key(7), mesh=mesh),
        opt,
    )
    state_b = training.restore_checkpoint(path, fresh)
    losses_b = []
    for b in batches[5:]:
        state_b, loss = step(state_b, b)
        losses_b.append(float(loss))

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-6)
    stack = layer.stacks[0].name
    assert float(state_b.model.state.value[stack]["step"]) == 10.0


def test_trainer_fit_validation_best_checkpoint(tmp_path):
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from keras_rs_tpu import training
    from keras_rs_tpu.models.two_tower import TwoTower

    model = TwoTower(50, 40, 8, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    u = rng.integers(0, 50, 512).astype(np.int32)
    it = ((u * 7) % 40).astype(np.int32)

    def loss_fn(m, batch):
        uu, ii = batch
        q, c = m.query_tower(uu), m.candidate_tower(ii)
        scores = q @ c.T
        labels = jnp.arange(scores.shape[0])
        return -jnp.mean(
            jnp.take_along_axis(
                jax.nn.log_softmax(scores, -1), labels[:, None], -1
            )
        )

    trainer = training.Trainer(model, optax.adagrad(0.5), loss_fn)

    def data():
        for i in range(0, 512, 128):
            yield (jnp.asarray(u[i : i + 128]), jnp.asarray(it[i : i + 128]))

    def val_fn(m):
        q, c = m.query_tower(jnp.asarray(u)), m.candidate_tower(
            jnp.asarray(it)
        )
        return float(-jnp.mean(jnp.sum(q * c, axis=-1)))

    log = tmp_path / "metrics.jsonl"
    hist = trainer.fit(
        data,
        epochs=3,
        log_every=0,
        prefetch=2,
        validation_fn=val_fn,
        checkpoint_dir=str(tmp_path / "ck"),
        metrics_log=str(log),
    )
    assert len(hist["loss"]) == 3 and len(hist["val"]) == 3
    lines = [json.loads(l) for l in log.read_text().splitlines()]
    assert len(lines) == 3 and "val" in lines[0]
    # best + last checkpoints exist and restore
    restored = training.restore_checkpoint(
        str(tmp_path / "ck" / "best"), trainer.state
    )
    assert restored is not None
