"""Deep recommender: multi-feature query/candidate towers with feature
engineering (bucketized continuous features, crossed features, multi-hot
history), recall@k eval with candidate refresh.

Parity with examples/deep_recommender.py in the reference (FeatureSpace
discretization/crosses + multi-feature towers + SparseTopK eval with
candidate refresh, :137-303, :487-760).

Run: python examples/deep_recommender.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.core.module import Module
from keras_rs_tpu.data.feature_engineering import (
    TextVectorizer,
    bucketize,
    hash_cross,
)
from keras_rs_tpu.layers import MLP, EmbedReduce
from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval

CROSS_BINS = 256


class QueryTower(Module):
    def __init__(self, num_users, num_age_buckets, dim, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.user_emb = EmbedReduce(num_users, dim, key=k1)
        self.age_emb = EmbedReduce(num_age_buckets + 1, 8, key=k2)
        # Crossed feature (user x age bucket), FeatureSpace.cross parity.
        self.cross_emb = EmbedReduce(CROSS_BINS, 8, key=k4)
        self.mlp = MLP(dim + 8 + 8, (64, dim), key=k3)

    def __call__(self, user_ids, age_bucket, cross_ids):
        x = jnp.concatenate(
            [
                self.user_emb(user_ids),
                self.age_emb(age_bucket),
                self.cross_emb(cross_ids),
            ],
            axis=-1,
        )
        return self.mlp(x)


class CandidateTower(Module):
    def __init__(self, num_items, num_genres, title_vocab, dim, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.item_emb = EmbedReduce(num_items, dim, key=k1)
        self.genre_emb = EmbedReduce(num_genres, 8, key=k2, combiner="mean")
        # Title text tower (TextVectorization parity): mean of token embs.
        self.title_emb = EmbedReduce(
            title_vocab, 8, key=k4, combiner="mean"
        )
        self.mlp = MLP(dim + 8 + 8, (64, dim), key=k3)

    def __call__(self, item_ids, genres, genre_weights, title_ids,
                 title_w):
        x = jnp.concatenate(
            [
                self.item_emb(item_ids),
                self.genre_emb(genres, genre_weights),
                self.title_emb(title_ids, title_w),
            ],
            axis=-1,
        )
        return self.mlp(x)


class DeepRecommender(Module):
    def __init__(self, num_users, num_items, num_genres, title_vocab,
                 dim, key):
        kq, kc = jax.random.split(key)
        self.query = QueryTower(num_users, 10, dim, kq)
        self.candidate = CandidateTower(
            num_items, num_genres, title_vocab, dim, kc
        )


def main():
    num_users, num_items, num_genres, dim = 400, 150, 12, 32
    rng = np.random.default_rng(0)
    # Stochastic multimodal preferences with a held-out eval split:
    # recall@10 sits below the top-10 preference-mass ceiling instead of
    # saturating at 1.0 (see synthetic.implicit_feedback).
    from keras_rs_tpu.data import synthetic

    fb = synthetic.implicit_feedback(
        num_users=num_users, num_items=num_items, num_events=20_000,
        holdout_per_user=2, seed=0,
    )
    user_ids, item_ids = fb["user_id"], fb["item_id"]
    n = len(user_ids)
    ages = rng.uniform(18, 80, size=n).astype(np.float32)
    age_bucket = bucketize(ages, np.linspace(20, 70, 9))
    item_genres = rng.integers(
        0, num_genres, size=(num_items, 3)
    ).astype(np.int32)
    genre_w = np.ones((num_items, 3), np.float32)
    # Synthetic titles -> TextVectorization-parity token ids.
    words = ["lion", "space", "war", "love", "king", "night", "return",
             "city", "last", "dream"]
    titles = [
        f"the {words[i % 10]} {words[(i * 3) % 10]}"
        for i in range(num_items)
    ]
    tv = TextVectorizer(output_sequence_length=4).adapt(titles)
    title_ids, title_w = tv(titles)

    model = DeepRecommender(
        num_users, num_items, num_genres, tv.vocabulary_size, dim,
        jax.random.key(0),
    )

    def loss_fn(m, batch):
        q = m.query(
            batch["user_id"], batch["age_bucket"], batch["cross"]
        )
        c = m.candidate(
            batch["item_id"], batch["genres"], batch["genre_w"],
            batch["title_ids"], batch["title_w"],
        )
        scores = q @ c.T
        labels = jnp.arange(scores.shape[0])
        return -jnp.mean(
            jnp.take_along_axis(
                jax.nn.log_softmax(scores, -1), labels[:, None], -1
            )
        )

    trainer = training.Trainer(model, optax.adagrad(0.2), loss_fn)

    def data():
        idx = np.random.default_rng(1).permutation(n)
        for i in range(0, n, 512):
            j = idx[i : i + 512]
            yield {
                "user_id": jnp.asarray(user_ids[j]),
                "age_bucket": jnp.asarray(age_bucket[j]),
                "cross": jnp.asarray(
                    hash_cross(
                        [user_ids[j], age_bucket[j]], CROSS_BINS
                    )
                ),
                "item_id": jnp.asarray(item_ids[j]),
                "genres": jnp.asarray(item_genres[item_ids[j]]),
                "genre_w": jnp.asarray(genre_w[item_ids[j]]),
                "title_ids": jnp.asarray(title_ids[item_ids[j]]),
                "title_w": jnp.asarray(title_w[item_ids[j]]),
            }

    trainer.fit(data, epochs=12, log_every=0)

    # Candidate refresh before eval (deep_recommender.py:669-672 parity).
    all_items = jnp.arange(num_items)
    candidates = trainer.model.candidate(
        all_items, jnp.asarray(item_genres), jnp.asarray(genre_w),
        jnp.asarray(title_ids), jnp.asarray(title_w),
    )
    retrieval = BruteForceRetrieval(candidates, k=10)
    eval_ages = bucketize(np.full(num_users, 40.0), np.linspace(20, 70, 9))
    q = trainer.model.query(
        jnp.arange(num_users),
        jnp.asarray(eval_ages),
        jnp.asarray(
            hash_cross([np.arange(num_users), eval_ages], CROSS_BINS)
        ),
    )
    _, top = retrieval(q)
    # Held-out events of each user (age features are query-side noise
    # here; preference comes from the latent factors).
    top = np.asarray(top)
    eu, ei = fb["eval_user_id"], fb["eval_item_id"]
    recall = float(np.mean([ei[j] in top[eu[j]] for j in range(len(eu))]))
    print(f"recall@10: {recall:.3f}")
    return recall


if __name__ == "__main__":
    main()
