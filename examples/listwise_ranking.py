"""Listwise ranking: pairwise hinge loss vs MSE, evaluated with NDCG@5.

Parity with examples/listwise_ranking.py in the reference (per-user 5-item
lists, MSE vs PairwiseHingeLoss, NDCG metric).

Run: python examples/listwise_ranking.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import losses, metrics, models, training
from keras_rs_tpu.data import synthetic


def make_lists(data, list_size=5, num_lists=2000, seed=0):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, 200, size=num_lists).astype(np.int32)
    items = rng.integers(0, 100, size=(num_lists, list_size)).astype(
        np.int32
    )
    # Ratings from the same latent structure as the synthetic dataset.
    full = synthetic.movielens_like(num_examples=1, seed=0)
    del full, data
    rng2 = np.random.default_rng(0)
    u_f = rng2.normal(size=(200, 4)) / 2.0
    i_f = rng2.normal(size=(100, 4)) / 2.0
    # Substantial rating noise (sigma 0.5 on a [0, 5] scale): the ideal
    # ranking is only partially recoverable, so NDCG@5 on held-out lists
    # lands off the 1.0 ceiling and separates the losses.
    labels = np.einsum(
        "ld,lkd->lk", u_f[users], i_f[items]
    ) + 0.25 * rng.normal(size=items.shape)
    labels = np.clip(2.5 + 2 * labels, 0, 5).astype(np.float32)
    return users, items, labels


def train(loss_obj, users, items, labels):
    model = models.TwoTower(200, 100, 16, key=jax.random.key(1))

    def item_scores(m, u, it):
        # Per-item scores: the candidate tower must NOT reduce the list
        # axis, so run it on flattened ids and restore [B, L].
        B, L = it.shape
        q = m.query_tower(u)[:, None, :]
        c = m.candidate_tower(it.reshape(-1)).reshape(B, L, -1)
        return jnp.sum(q * c, axis=-1)

    def loss_fn(m, batch):
        u, it, y = batch
        return loss_obj(y_true=y, y_pred=item_scores(m, u, it))

    trainer = training.Trainer(model, optax.adagrad(0.3), loss_fn)

    def data():
        for i in range(0, len(users), 256):
            yield (
                jnp.asarray(users[i : i + 256]),
                jnp.asarray(items[i : i + 256]),
                jnp.asarray(labels[i : i + 256]),
            )

    trainer.fit(data, epochs=10, log_every=0)
    # NDCG@5 on HELD-OUT lists from the same latent structure.
    eu, ei, ey = make_lists(None, num_lists=500, seed=7)
    m = metrics.NDCG(k=5, shuffle_ties=False)
    scores = item_scores(trainer.model, jnp.asarray(eu), jnp.asarray(ei))
    m.update_state(jnp.asarray(ey), scores)
    return float(m.result())


def main():
    users, items, labels = make_lists(None)
    ndcg_mse = train(
        losses.PairwiseMeanSquaredError(), users, items, labels
    )
    ndcg_hinge = train(losses.PairwiseHingeLoss(), users, items, labels)
    print(f"NDCG@5  pairwise MSE:   {ndcg_mse:.4f}")
    print(f"NDCG@5  pairwise hinge: {ndcg_hinge:.4f}")
    return ndcg_mse, ndcg_hinge


if __name__ == "__main__":
    main()
