"""Basic ranking: two-embedding MLP rating regressor.

Parity with examples/basic_ranking.py:113-190 in the reference (MovieLens
two-embedding MLP(256,64,1), MSE, Adagrad(0.1)); uses the synthetic
MovieLens-like dataset since this sandbox has no network access.

Run: python examples/basic_ranking.py
"""

import jax
import numpy as np
import optax

from keras_rs_tpu import models, training
from keras_rs_tpu.data import synthetic


def main():
    data = synthetic.movielens_like(
        num_users=943, num_items=1682, num_examples=50_000, seed=0
    )
    model = models.BasicRanking(
        num_users=943,
        num_items=1682,
        embedding_dim=32,
        hidden_units=(256, 64, 1),
        key=jax.random.key(42),
    )
    trainer = training.Trainer(model, optax.adagrad(0.1), models.mse_loss)
    trainer.fit(
        lambda: synthetic.batches(data, 4096, seed=1),
        epochs=5,
        log_every=0,
    )

    # Eval: RMSE on fresh samples.
    test = synthetic.movielens_like(
        num_users=943, num_items=1682, num_examples=10_000, seed=99
    )
    pred = trainer.model(test["user_id"], test["item_id"])
    rmse = float(np.sqrt(np.mean((np.asarray(pred) - test["rating"]) ** 2)))
    print(f"test RMSE: {rmse:.4f}")
    return rmse


if __name__ == "__main__":
    main()
