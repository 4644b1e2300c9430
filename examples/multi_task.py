"""Multi-task recommender: joint retrieval + ranking — a walkthrough.

Counterpart of the reference's examples/multi_task.py (389 lines): one
two-tower backbone shared by TWO heads — a retrieval task (in-batch
sampled softmax on user/item co-occurrence) and a ranking task (an MLP
over the concatenated tower outputs regressing the rating) — trained
with a weighted sum of the two losses (:112-255). The reference's
experiment is the loss-weight sweep below: a rating-specialized model, a
retrieval-specialized model, and a joint model, each evaluated on BOTH
tasks (held-out data), showing that the joint model is competitive with
both specialists — the transfer-learning argument for multi-task
recommenders.

Run: python examples/multi_task.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import models, training
from keras_rs_tpu.core.module import Module
from keras_rs_tpu.data import synthetic
from keras_rs_tpu.layers import MLP


class MultiTaskModel(Module):
    """Shared two-tower backbone + rating head.

    The towers produce the retrieval space; the rating head reads BOTH
    tower outputs (it may use interactions the dot-product can't see).
    """

    def __init__(self, num_users, num_items, dim, key):
        k1, k2 = jax.random.split(key)
        self.towers = models.TwoTower(num_users, num_items, dim, key=k1)
        self.rating_head = MLP(2 * dim, (64, 1), key=k2)

    def rating(self, user_ids, item_ids):
        q = self.towers.query_tower(user_ids)
        c = self.towers.candidate_tower(item_ids)
        return self.rating_head(jnp.concatenate([q, c], axis=-1))[..., 0]


def make_loss(retrieval_weight: float, rating_weight: float):
    """Weighted multi-task objective (reference :112-147)."""

    def loss_fn(model, batch):
        loss = 0.0
        if retrieval_weight:
            loss += retrieval_weight * models.in_batch_softmax_loss(
                model.towers, batch["user_id"], batch["item_id"]
            )
        if rating_weight:
            pred = model.rating(batch["user_id"], batch["item_id"])
            loss += rating_weight * jnp.mean(
                (pred - batch["rating"]) ** 2
            )
        return loss

    return loss_fn


def train_and_eval(weights, train, test, num_users, num_items, seed=0):
    retrieval_w, rating_w = weights
    model = MultiTaskModel(num_users, num_items, 32, jax.random.key(seed))
    trainer = training.Trainer(
        model, optax.adagrad(0.1), make_loss(retrieval_w, rating_w)
    )
    trainer.fit(
        lambda: synthetic.batches(train, 512, seed=1),
        epochs=5,
        log_every=0,
    )
    # Rating task: held-out RMSE.
    pred = trainer.model.rating(test["user_id"], test["item_id"])
    rmse = float(
        np.sqrt(np.mean((np.asarray(pred) - test["rating"]) ** 2))
    )
    # Retrieval task: held-out recall@10 through the tower dot product.
    retrieval = trainer.model.towers.make_retrieval(k=10)
    q = trainer.model.towers.query_tower(jnp.asarray(test["user_id"]))
    _, top = retrieval(q)
    top = np.asarray(top)
    recall = float(
        np.mean(
            [test["item_id"][j] in top[j] for j in range(len(top))]
        )
    )
    return rmse, recall


def main():
    num_users, num_items = 300, 300
    # Events where the ITEM CHOICE and the RATING derive from the same
    # latent affinity (watch+rating logs): both task signals exist and
    # share structure, so multi-task transfer is observable.
    fb = synthetic.implicit_feedback(
        num_users=num_users, num_items=num_items, num_events=24_000,
        holdout_per_user=4, seed=0, with_ratings=True,
    )
    train = {
        "user_id": fb["user_id"],
        "item_id": fb["item_id"],
        "rating": fb["rating"],
    }
    test = {
        "user_id": fb["eval_user_id"],
        "item_id": fb["eval_item_id"],
        "rating": fb["eval_rating"],
    }

    # The reference's three-way experiment: specialist vs joint.
    sweep = {
        "rating only   (0, 1)": (0.0, 1.0),
        "retrieval only(1, 0)": (1.0, 0.0),
        "joint         (1, 1)": (1.0, 1.0),
    }
    results = {}
    for name, w in sweep.items():
        rmse, recall = train_and_eval(
            w, train, test, num_users, num_items
        )
        results[name] = (rmse, recall)
        print(
            f"{name}: held-out rating RMSE {rmse:.4f}, "
            f"recall@10 {recall:.3f}"
        )
    joint_rmse, _ = results["joint         (1, 1)"]
    print(f"joint loss: n/a, rating RMSE: {joint_rmse:.4f}")
    return joint_rmse


if __name__ == "__main__":
    main()
