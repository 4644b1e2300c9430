"""SASRec: transformer-based sequential recommendation.

Parity with examples/sas_rec.py in the reference (tied item embedding +
position embedding + causal transformer blocks, contrastive BCE on
positive/negative sequences, ML-1M sessions there). Sessions come from
`synthetic.markov_sessions` — a noisy transition graph giving next-item
prediction intrinsic entropy, so held-out recall@10 sits well below 1.0
and discriminates model quality (the old deterministic +1 sequences
saturated at recall 1.0).

Run: python examples/sas_rec.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.data import synthetic
from keras_rs_tpu.models.sasrec import SASRec, sasrec_loss

NUM_ITEMS = 500
BRANCHING = 12
NOISE = 0.2
T = 20


def main():
    seq = synthetic.markov_sessions(
        num_items=NUM_ITEMS, num_sessions=6144, length=T,
        branching=BRANCHING, noise=NOISE, seed=0,
    )
    rng = np.random.default_rng(1)
    hist = seq[:, :T]
    pos = seq[:, 1 : T + 1]  # next item at every position
    neg = rng.integers(1, NUM_ITEMS + 1, size=pos.shape).astype(np.int32)
    neg = np.where(neg == pos, (pos % NUM_ITEMS) + 1, neg)
    n_train = 5120

    model = SASRec(
        vocabulary_size=NUM_ITEMS,
        num_layers=2,
        num_heads=2,
        hidden_dim=64,
        max_sequence_length=32,
        key=jax.random.key(0),
    )
    trainer = training.Trainer(model, optax.adam(0.005), sasrec_loss)

    def data():
        for i in range(0, n_train, 256):
            yield {
                "item_history": jnp.asarray(hist[i : i + 256]),
                "positive_sequence": jnp.asarray(pos[i : i + 256]),
                "negative_sequence": jnp.asarray(neg[i : i + 256]),
            }

    h = trainer.fit(data, epochs=10, log_every=0)
    print(f"loss: {h['loss'][0]:.4f} -> {h['loss'][-1]:.4f}")

    # Next-item recall on HELD-OUT sessions via the tied-embedding
    # retrieval head (ceiling ~(1-noise)*10/branching ~= 0.67).
    user_repr = trainer.model(jnp.asarray(hist[n_train:]))
    retrieval = trainer.model.make_retrieval(k=10)
    _, top = retrieval(user_repr)
    top = np.asarray(top)
    truth = pos[n_train:, -1]
    recall = np.mean([truth[i] in top[i] for i in range(len(top))])
    ceiling = (1 - NOISE) * 10 / BRANCHING
    print(f"recall@10: {recall:.3f} (task ceiling ~{ceiling:.2f})")
    return recall


if __name__ == "__main__":
    main()
