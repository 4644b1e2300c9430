"""GRU4Rec sequential retrieval model.

Capability parity with examples/sequential_retrieval.py:284-359: an item
embedding + GRU query tower, an embedding candidate tower (weights shared
with retrieval candidates), and in-batch softmax cross-entropy training.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from keras_rs_tpu.core.module import Module
from keras_rs_tpu.layers.attention import Embedding
from keras_rs_tpu.layers.recurrent import GRU
from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval
from keras_rs_tpu.types import Tensor


class GRU4Rec(Module):
    def __init__(
        self,
        num_items: int,
        embedding_dim: int = 128,
        *,
        key: jax.Array,
        dtype: Any = jnp.float32,
    ) -> None:
        k_q, k_c, k_gru = jax.random.split(key, 3)
        # +1 for the padding id 0 (parity with movies_count + 1).
        self.query_embedding = Embedding(
            num_items + 1, embedding_dim, key=k_q, dtype=dtype
        )
        self.gru = GRU(embedding_dim, embedding_dim, key=k_gru, dtype=dtype)
        self.candidate_embedding = Embedding(
            num_items + 1, embedding_dim, key=k_c, dtype=dtype
        )
        self.num_items = num_items
        self.embedding_dim = embedding_dim

    def query_tower(
        self, item_history: Tensor, mask: Tensor | None = None
    ) -> Tensor:
        """item_history: [B, T] item ids (0 = padding)."""
        if mask is None:
            mask = (item_history != 0).astype(jnp.float32)
        x = self.query_embedding(item_history)
        return self.gru(x, mask=mask)

    def __call__(
        self, item_history: Tensor, mask: Tensor | None = None
    ) -> Tensor:
        return self.query_tower(item_history, mask)

    def make_retrieval(self, k: int = 10) -> BruteForceRetrieval:
        return BruteForceRetrieval(
            self.candidate_embedding.embeddings, k=k, return_scores=False
        )


def gru4rec_loss(model: GRU4Rec, batch: dict) -> Tensor:
    """In-batch softmax CCE with identity labels
    (examples/sequential_retrieval.py:343-359)."""
    q = model.query_tower(batch["item_history"])
    c = model.candidate_embedding(batch["target_item"])
    scores = jnp.matmul(q, c.T, preferred_element_type=q.dtype)
    logprobs = jax.nn.log_softmax(scores, axis=-1)
    labels = jnp.arange(scores.shape[0])
    return -jnp.mean(
        jnp.take_along_axis(logprobs, labels[:, None], axis=-1)
    )
