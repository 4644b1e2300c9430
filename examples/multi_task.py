"""Multi-task model: joint retrieval (in-batch softmax) + ranking (MSE).

Parity with examples/multi_task.py in the reference (two-tower with
weighted retrieval + rating losses).

Run: python examples/multi_task.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import models, training
from keras_rs_tpu.core.module import Module
from keras_rs_tpu.data import synthetic
from keras_rs_tpu.layers import MLP


class MultiTaskModel(Module):
    def __init__(self, num_users, num_items, dim, key):
        k1, k2 = jax.random.split(key)
        self.towers = models.TwoTower(num_users, num_items, dim, key=k1)
        self.rating_head = MLP(2 * dim, (64, 1), key=k2)

    def rating(self, user_ids, item_ids):
        q = self.towers.query_tower(user_ids)
        c = self.towers.candidate_tower(item_ids)
        return self.rating_head(jnp.concatenate([q, c], axis=-1))[..., 0]


def loss_fn(model, batch, retrieval_weight=1.0, rating_weight=1.0):
    retrieval = models.in_batch_softmax_loss(
        model.towers, batch["user_id"], batch["item_id"]
    )
    rating = jnp.mean(
        (model.rating(batch["user_id"], batch["item_id"])
         - batch["rating"]) ** 2
    )
    return retrieval_weight * retrieval + rating_weight * rating


def main():
    data = synthetic.movielens_like(
        num_users=200, num_items=100, num_examples=20_000, seed=0
    )
    model = MultiTaskModel(200, 100, 32, jax.random.key(0))
    trainer = training.Trainer(model, optax.adagrad(0.1), loss_fn)
    hist = trainer.fit(
        lambda: synthetic.batches(data, 512, seed=1),
        epochs=5,
        log_every=0,
    )
    pred = trainer.model.rating(data["user_id"][:4096],
                                data["item_id"][:4096])
    rmse = float(
        np.sqrt(np.mean((np.asarray(pred) - data["rating"][:4096]) ** 2))
    )
    print(f"joint loss: {hist['loss'][-1]:.4f}, rating RMSE: {rmse:.4f}")
    return rmse


if __name__ == "__main__":
    main()
