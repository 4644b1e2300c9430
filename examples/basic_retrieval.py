"""Basic retrieval: two-tower model + brute-force top-k.

Parity with examples/basic_retrieval.py:218-307 in the reference.

Run: python examples/basic_retrieval.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import models, training
from keras_rs_tpu.data import synthetic


def main():
    num_users, num_items = 500, 200
    rng = np.random.default_rng(0)
    # Users like items congruent to them mod num_items.
    user_ids = rng.integers(0, num_users, size=20_000).astype(np.int32)
    item_ids = ((user_ids * 7) % num_items).astype(np.int32)

    model = models.TwoTower(
        num_users, num_items, embedding_dim=32, key=jax.random.key(0)
    )

    def loss_fn(model, batch):
        return models.in_batch_softmax_loss(
            model, batch["user_id"], batch["item_id"]
        )

    trainer = training.Trainer(model, optax.adagrad(0.2), loss_fn)
    data = {"user_id": user_ids, "item_id": item_ids}
    trainer.fit(
        lambda: synthetic.batches(data, 512, seed=3),
        epochs=8,
        log_every=0,
    )

    retrieval = trainer.model.make_retrieval(k=10)
    queries = trainer.model.query_tower(jnp.arange(num_users))
    _, top = retrieval(queries)
    truth = (np.arange(num_users) * 7) % num_items
    recall_at_10 = float(
        np.mean([truth[u] in np.asarray(top)[u] for u in range(num_users)])
    )
    print(f"recall@10: {recall_at_10:.3f}")
    return recall_at_10


if __name__ == "__main__":
    main()
