"""Synthetic datasets for tests and benchmarks.

The reference's examples pull MovieLens/Criteo via tensorflow_datasets;
this sandbox has no network, so we generate structurally-identical
synthetic data: a MovieLens-like ratings table with latent user/item
factors (so models can actually learn), and a Criteo-like DLRM batch
generator (13 dense + 26 multi-hot categoricals, parity with
examples/ml_perf/dataloader.py:67-133's dummy mode).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def movielens_like(
    num_users: int = 200,
    num_items: int = 100,
    num_examples: int = 5000,
    latent_dim: int = 4,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Ratings from random latent factors + noise, in [0.5, 5]."""
    rng = np.random.default_rng(seed)
    u_factors = rng.normal(size=(num_users, latent_dim)) / np.sqrt(latent_dim)
    i_factors = rng.normal(size=(num_items, latent_dim)) / np.sqrt(latent_dim)
    user_ids = rng.integers(0, num_users, size=num_examples)
    item_ids = rng.integers(0, num_items, size=num_examples)
    raw = np.sum(u_factors[user_ids] * i_factors[item_ids], axis=-1)
    rating = np.clip(2.75 + 2.0 * raw + 0.1 * rng.normal(size=num_examples),
                     0.5, 5.0)
    return {
        "user_id": user_ids.astype(np.int32),
        "item_id": item_ids.astype(np.int32),
        "rating": rating.astype(np.float32),
    }


def batches(
    data: dict[str, np.ndarray],
    batch_size: int,
    *,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator[dict[str, np.ndarray]]:
    """Shuffled mini-batches over a dict-of-arrays dataset."""
    n = len(next(iter(data.values())))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for start in range(0, end, batch_size):
        idx = perm[start : start + batch_size]
        yield {k: v[idx] for k, v in data.items()}


def criteo_like_batch(
    batch_size: int,
    *,
    num_dense: int = 13,
    vocab_sizes: list[int] | None = None,
    multi_hot_sizes: list[int] | None = None,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """One Criteo-shaped batch: dense floats + per-feature multi-hot ids."""
    rng = np.random.default_rng(seed)
    if vocab_sizes is None:
        vocab_sizes = [1000] * 26
    if multi_hot_sizes is None:
        multi_hot_sizes = [1] * len(vocab_sizes)
    out: dict[str, np.ndarray] = {
        "dense": rng.normal(size=(batch_size, num_dense)).astype(np.float32),
        "label": rng.integers(0, 2, size=(batch_size,)).astype(np.float32),
    }
    for i, (v, m) in enumerate(zip(vocab_sizes, multi_hot_sizes)):
        out[f"cat_{i}"] = rng.integers(
            0, v, size=(batch_size, m), dtype=np.int64
        )
    return out
