"""Sequential retrieval with GRU4Rec — a walkthrough with a calibrated
oracle.

Counterpart of the reference's examples/sequential_retrieval.py (413
lines): MovieLens-1M watch sessions -> an Embedding -> GRU query tower
trained with in-batch softmax, evaluated by next-item retrieval. Without
network access, sessions come from `synthetic.markov_sessions`: a noisy
item-transition graph, which buys something real data cannot give — a
COMPUTABLE ceiling. Because the generator is first-order Markov, the
best possible order-1 predictor is known exactly: rank the successors of
the last item. This walkthrough therefore reports THREE numbers:

    popularity baseline   <=   GRU4Rec   <=   order-1 oracle

so the model's recall@10 is read as "fraction of the learnable signal
captured" instead of a bare value. (The oracle itself sits below
(1 - noise) because noise steps are unpredictable by construction.)

Run: python examples/sequential_retrieval.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.data import synthetic
from keras_rs_tpu.models.gru4rec import GRU4Rec, gru4rec_loss

NUM_ITEMS = 500
BRANCHING = 12
NOISE = 0.2


def order1_oracle_recall(hist, target, trans_counts, k=10):
    """Best possible order-1 predictor: top-k successors of the last
    item under the EMPIRICAL transition counts (learned from train
    data, like any model must)."""
    last = hist[:, -1]
    # top-k successors per item id.
    topk = np.argsort(trans_counts, axis=1)[:, -k:]
    return float(
        np.mean([target[i] in topk[last[i]] for i in range(len(last))])
    )


def main():
    seq = synthetic.markov_sessions(
        num_items=NUM_ITEMS, num_sessions=10_240, length=10,
        branching=BRANCHING, noise=NOISE, seed=0,
    )
    hist, target = seq[:, :-1], seq[:, -1]
    n_train = 8192

    # Empirical transition counts from the TRAIN sessions only.
    trans = np.zeros((NUM_ITEMS + 1, NUM_ITEMS + 1), np.int32)
    src = seq[:n_train, :-1].reshape(-1)
    dst = seq[:n_train, 1:].reshape(-1)
    np.add.at(trans, (src, dst), 1)

    model = GRU4Rec(NUM_ITEMS, embedding_dim=64, key=jax.random.key(0))
    trainer = training.Trainer(model, optax.adam(0.01), gru4rec_loss)

    def data():
        order = np.random.default_rng(4).permutation(n_train)
        for i in range(0, n_train, 256):
            j = order[i : i + 256]
            yield {
                "item_history": jnp.asarray(hist[j]),
                "target_item": jnp.asarray(target[j]),
            }

    trainer.fit(data, epochs=15, log_every=0)

    # Held-out sessions.
    retrieval = trainer.model.make_retrieval(k=10)
    q = trainer.model.query_tower(jnp.asarray(hist[n_train:]))
    top = np.asarray(retrieval(q))
    held_target = target[n_train:]
    recall = float(
        np.mean([held_target[i] in top[i] for i in range(len(top))])
    )

    oracle = order1_oracle_recall(
        hist[n_train:], held_target, trans, k=10
    )
    pop = np.argsort(np.bincount(dst, minlength=NUM_ITEMS + 1))[-10:]
    pop_recall = float(np.mean(np.isin(held_target, pop)))
    captured = (recall - pop_recall) / max(oracle - pop_recall, 1e-9)
    print(
        f"recall@10: {recall:.3f}  "
        f"(popularity {pop_recall:.3f}, order-1 oracle {oracle:.3f} -> "
        f"{captured:.0%} of the learnable signal captured)"
    )
    return recall


if __name__ == "__main__":
    main()
