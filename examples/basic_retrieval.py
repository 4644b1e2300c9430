"""Basic retrieval: two-tower model + brute-force top-k.

Parity with examples/basic_retrieval.py:218-307 in the reference (two
embedding towers trained with an in-batch sampled-softmax loss, then a
`BruteForceRetrieval` layer attached for inference). The sandbox has no
network, so instead of MovieLens we train on `synthetic.implicit_feedback`
— stochastic multimodal user preferences, so recall@10 on HELD-OUT events
is bounded well below 1.0 and stays discriminative (see the generator's
docstring). A popularity baseline is printed alongside for scale.

Run: python examples/basic_retrieval.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import models, training
from keras_rs_tpu.data import synthetic


def main():
    num_users, num_items = 500, 1000
    data = synthetic.implicit_feedback(
        num_users=num_users, num_items=num_items, num_events=60_000,
        holdout_per_user=2, seed=0,
    )

    model = models.TwoTower(
        num_users, num_items, embedding_dim=32, key=jax.random.key(0)
    )

    def loss_fn(model, batch):
        return models.in_batch_softmax_loss(
            model, batch["user_id"], batch["item_id"]
        )

    trainer = training.Trainer(model, optax.adagrad(0.2), loss_fn)
    train = {"user_id": data["user_id"], "item_id": data["item_id"]}
    trainer.fit(
        lambda: synthetic.batches(train, 512, seed=3),
        epochs=20,
        log_every=0,
    )

    # Evaluate on held-out events: was the user's NEXT sampled item in
    # the top-10? (Stochastic preferences => the ceiling is the top-10
    # preference mass, not 1.0.)
    retrieval = trainer.model.make_retrieval(k=10)
    eval_u = data["eval_user_id"]
    eval_i = data["eval_item_id"]
    queries = trainer.model.query_tower(jnp.asarray(eval_u))
    _, top = retrieval(queries)
    top = np.asarray(top)
    recall_at_10 = float(
        np.mean([eval_i[j] in top[j] for j in range(len(eval_u))])
    )

    # Popularity baseline: always recommend the 10 globally most common
    # train items.
    pop = np.argsort(np.bincount(data["item_id"], minlength=num_items))[
        -10:
    ]
    pop_recall = float(np.mean(np.isin(eval_i, pop)))

    print(
        f"recall@10: {recall_at_10:.3f} "
        f"(popularity baseline {pop_recall:.3f})"
    )

    # Deployment: fuse tower + top-k into one function and export it as
    # a portable StableHLO artifact a serving process can load WITHOUT
    # this model code (serving.py; the reference stops at attaching the
    # retrieval layer at inference time, basic_retrieval.py:260-269).
    from keras_rs_tpu.serving import (
        export_fn,
        import_fn,
        make_retrieval_service,
    )

    service = make_retrieval_service(
        trainer.model.query_tower, retrieval
    )
    blob = export_fn(service, jnp.asarray(eval_u[:8]))
    served_scores, served_ids = import_fn(blob)(jnp.asarray(eval_u[:8]))
    direct_scores, direct_ids = service(jnp.asarray(eval_u[:8]))
    assert np.array_equal(np.asarray(served_ids), np.asarray(direct_ids))
    print(
        f"serving export round-trip OK ({len(blob) / 1e3:.0f} KB "
        "artifact reproduces the top-k)"
    )
    return recall_at_10


if __name__ == "__main__":
    main()
