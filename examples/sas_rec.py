"""SASRec: transformer-based sequential recommendation.

Parity with examples/sas_rec.py in the reference (tied item embedding +
position embedding + causal transformer blocks, contrastive BCE on
positive/negative sequences).

Run: python examples/sas_rec.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.models.sasrec import SASRec, sasrec_loss


def make_data(num_items=100, n=4096, t=20, seed=0):
    rng = np.random.default_rng(seed)
    start = rng.integers(1, num_items, size=n)
    hist = ((start[:, None] + np.arange(t)) % num_items) + 1
    pos = (hist % num_items) + 1
    neg = rng.integers(1, num_items + 1, size=hist.shape)
    neg = np.where(neg == pos, (pos % num_items) + 1, neg)
    return (
        hist.astype(np.int32),
        pos.astype(np.int32),
        neg.astype(np.int32),
    )


def main():
    num_items = 100
    hist, pos, neg = make_data(num_items)
    model = SASRec(
        vocabulary_size=num_items,
        num_layers=2,
        num_heads=2,
        hidden_dim=64,
        max_sequence_length=32,
        key=jax.random.key(0),
    )
    trainer = training.Trainer(model, optax.adam(0.005), sasrec_loss)

    def data():
        for i in range(0, len(hist), 256):
            yield {
                "item_history": jnp.asarray(hist[i : i + 256]),
                "positive_sequence": jnp.asarray(pos[i : i + 256]),
                "negative_sequence": jnp.asarray(neg[i : i + 256]),
            }

    h = trainer.fit(data, epochs=5, log_every=0)
    print(f"loss: {h['loss'][0]:.4f} -> {h['loss'][-1]:.4f}")

    # Next-item accuracy via the tied-embedding retrieval head.
    user_repr = trainer.model(jnp.asarray(hist[:512]))
    retrieval = trainer.model.make_retrieval(k=10)
    _, top = retrieval(user_repr)
    truth = (hist[:512, -1] % num_items) + 1
    recall = np.mean(
        [truth[i] in np.asarray(top)[i] for i in range(512)]
    )
    print(f"recall@10: {recall:.3f}")
    return recall


if __name__ == "__main__":
    main()
