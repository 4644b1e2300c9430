"""Sequential retrieval with GRU4Rec.

Parity with examples/sequential_retrieval.py in the reference (Embedding ->
GRU query tower, in-batch softmax CCE).

Run: python examples/sequential_retrieval.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.models.gru4rec import GRU4Rec, gru4rec_loss


def make_sequences(num_items=200, n=8192, t=10, seed=0):
    rng = np.random.default_rng(seed)
    start = rng.integers(1, num_items, size=n)
    hist = ((start[:, None] + np.arange(t)) % num_items) + 1
    target = ((start + t) % num_items) + 1
    return hist.astype(np.int32), target.astype(np.int32)


def main():
    num_items = 200
    hist, target = make_sequences(num_items)
    model = GRU4Rec(num_items, embedding_dim=64, key=jax.random.key(0))
    trainer = training.Trainer(model, optax.adam(0.01), gru4rec_loss)

    def data():
        for i in range(0, len(hist), 256):
            yield {
                "item_history": jnp.asarray(hist[i : i + 256]),
                "target_item": jnp.asarray(target[i : i + 256]),
            }

    trainer.fit(data, epochs=5, log_every=0)
    retrieval = trainer.model.make_retrieval(k=10)
    q = trainer.model.query_tower(jnp.asarray(hist[:1024]))
    top = np.asarray(retrieval(q))
    recall = np.mean(
        [target[i] in top[i] for i in range(len(top))]
    )
    print(f"recall@10: {recall:.3f}")
    return recall


if __name__ == "__main__":
    main()
