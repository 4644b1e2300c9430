"""GRU4Rec and SASRec: shapes, masking semantics, learning on synthetic
next-item data."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.layers.recurrent import GRU
from keras_rs_tpu.models.gru4rec import GRU4Rec, gru4rec_loss
from keras_rs_tpu.models.sasrec import SASRec, sasrec_loss


def test_gru_masking_carries_state():
    gru = GRU(4, 8, key=jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 5, 4))
    # Full mask vs mask cutting the last 2 steps: masked result must equal
    # running only the first 3 steps.
    mask = jnp.array([[1, 1, 1, 0, 0], [1, 1, 1, 0, 0]], jnp.float32)
    h_masked = gru(x, mask=mask)
    h_prefix = gru(x[:, :3], mask=mask[:, :3])
    np.testing.assert_allclose(
        np.asarray(h_masked), np.asarray(h_prefix), rtol=1e-5
    )


def make_seq_data(num_items=32, n=512, t=6, seed=0):
    """Deterministic next-item pattern: next = (last + 1) % num_items."""
    rng = np.random.default_rng(seed)
    start = rng.integers(1, num_items, size=n)
    hist = (
        (start[:, None] + np.arange(t)[None, :]) % num_items
    ) + 1  # ids in [1, num_items]
    target = ((start + t) % num_items) + 1
    return hist.astype(np.int32), target.astype(np.int32)


def test_gru4rec_learns_next_item():
    num_items = 32
    hist, target = make_seq_data(num_items)
    model = GRU4Rec(num_items, embedding_dim=32, key=jax.random.key(0))

    trainer = training.Trainer(model, optax.adam(0.02), gru4rec_loss)

    def data():
        for i in range(0, len(hist), 128):
            yield {
                "item_history": jnp.asarray(hist[i : i + 128]),
                "target_item": jnp.asarray(target[i : i + 128]),
            }

    h = trainer.fit(data, epochs=6, log_every=0)
    assert h["loss"][-1] < h["loss"][0] * 0.5, h["loss"]

    # Retrieval: top-1 should frequently be the true next item.
    retrieval = trainer.model.make_retrieval(k=1)
    q = trainer.model.query_tower(jnp.asarray(hist[:128]))
    top = np.asarray(retrieval(q))[:, 0]
    acc = (top == target[:128]).mean()
    assert acc > 0.5, acc


def test_sasrec_shapes_and_padding_invariance():
    model = SASRec(
        vocabulary_size=50, num_layers=2, num_heads=2, hidden_dim=16,
        max_sequence_length=10, key=jax.random.key(0),
    )
    ids = jnp.array([[3, 5, 7, 0, 0], [1, 2, 0, 0, 0]])
    repr_ = model(ids)
    assert repr_.shape == (2, 16)
    # The user representation must not depend on padding length.
    ids_longer_pad = jnp.array(
        [[3, 5, 7, 0, 0, 0, 0], [1, 2, 0, 0, 0, 0, 0]]
    )
    repr2 = model(ids_longer_pad)
    np.testing.assert_allclose(
        np.asarray(repr_), np.asarray(repr2), atol=1e-5
    )


def test_sasrec_learns():
    num_items = 32
    hist, target = make_seq_data(num_items, t=6)
    # positive_sequence[t] = next item after hist[t] = hist[t] + 1 cyclic.
    pos = (hist % num_items) + 1
    rng = np.random.default_rng(1)
    neg = rng.integers(1, num_items + 1, size=hist.shape).astype(np.int32)
    neg = np.where(neg == pos, (pos % num_items) + 1, neg)

    model = SASRec(
        vocabulary_size=num_items, num_layers=1, num_heads=1,
        hidden_dim=32, max_sequence_length=8, key=jax.random.key(0),
    )
    trainer = training.Trainer(model, optax.adam(0.02), sasrec_loss)

    def data():
        for i in range(0, len(hist), 128):
            yield {
                "item_history": jnp.asarray(hist[i : i + 128]),
                "positive_sequence": jnp.asarray(pos[i : i + 128]),
                "negative_sequence": jnp.asarray(neg[i : i + 128]),
            }

    h = trainer.fit(data, epochs=6, log_every=0)
    assert h["loss"][-1] < h["loss"][0] * 0.6, h["loss"]
    del target
