"""Basic ranking model: two embeddings + MLP rating regressor.

Capability parity with examples/basic_ranking.py:113-190 (MovieLens
two-embedding MLP(256, 64, 1), MSE loss) — the reference's "minimum
end-to-end slice".
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from keras_rs_tpu.core.module import Module
from keras_rs_tpu.layers.dense import MLP
from keras_rs_tpu.layers.embedding.embed_reduce import EmbedReduce
from keras_rs_tpu.types import Tensor


class BasicRanking(Module):
    def __init__(
        self,
        num_users: int,
        num_items: int,
        embedding_dim: int = 32,
        hidden_units: tuple[int, ...] = (256, 64, 1),
        *,
        key: jax.Array,
        dtype: Any = jnp.float32,
    ) -> None:
        ku, ki, km = jax.random.split(key, 3)
        self.user_embedding = EmbedReduce(
            num_users, embedding_dim, key=ku, dtype=dtype
        )
        self.item_embedding = EmbedReduce(
            num_items, embedding_dim, key=ki, dtype=dtype
        )
        self.mlp = MLP(2 * embedding_dim, hidden_units, key=km, dtype=dtype)

    def __call__(self, user_ids: Tensor, item_ids: Tensor) -> Tensor:
        x = jnp.concatenate(
            [self.user_embedding(user_ids), self.item_embedding(item_ids)],
            axis=-1,
        )
        return self.mlp(x)[..., 0]


def mse_loss(model: BasicRanking, batch: dict) -> Tensor:
    pred = model(batch["user_id"], batch["item_id"])
    return jnp.mean((pred - batch["rating"]) ** 2)
