"""SASRec: self-attentive sequential recommendation.

Capability parity with examples/sas_rec.py:377-561: tied (reversible) item
embedding + learned position embedding + N causal transformer blocks, with
the contrastive BCE objective on aligned positive/negative sequences.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from keras_rs_tpu.core.module import Module
from keras_rs_tpu.layers.attention import (
    Embedding,
    LayerNorm,
    PositionEmbedding,
    TransformerBlock,
)
from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval
from keras_rs_tpu.types import Tensor


class SASRec(Module):
    def __init__(
        self,
        vocabulary_size: int,
        num_layers: int = 2,
        num_heads: int = 1,
        hidden_dim: int = 50,
        mlp_dim: int | None = None,
        max_sequence_length: int = 200,
        *,
        key: jax.Array,
        dtype: Any = jnp.float32,
    ) -> None:
        keys = jax.random.split(key, num_layers + 2)
        self.item_embedding = Embedding(
            vocabulary_size + 1,
            hidden_dim,
            key=keys[0],
            embeddings_initializer="glorot_uniform",
            dtype=dtype,
        )
        self.position_embedding = PositionEmbedding(
            max_sequence_length, hidden_dim, key=keys[1], dtype=dtype
        )
        self.blocks = [
            TransformerBlock(
                hidden_dim,
                num_heads,
                mlp_dim or hidden_dim,
                key=k,
                dtype=dtype,
            )
            for k in keys[2:]
        ]
        self.final_norm = LayerNorm(hidden_dim, dtype=dtype)
        self.vocabulary_size = vocabulary_size
        self.hidden_dim = hidden_dim
        self.max_sequence_length = max_sequence_length
        # Embedding scale, like the reference (sqrt(d) * E).
        self.scale = float(hidden_dim) ** 0.5

    def encode(self, item_ids: Tensor) -> Tensor:
        """item_ids: [B, T] (0 = padding) -> [B, T, D] states."""
        padding_mask = (item_ids != 0).astype(jnp.float32)
        x = self.item_embedding(item_ids) * self.scale
        x = x + self.position_embedding(x)
        x = x * padding_mask[..., None]
        for block in self.blocks:
            x = block(x, padding_mask=padding_mask)
            x = x * padding_mask[..., None]
        return self.final_norm(x)

    def __call__(self, item_ids: Tensor) -> Tensor:
        """Returns the final-position user representation [B, D]."""
        states = self.encode(item_ids)
        # Last non-padding position per row
        # (parity: _get_last_non_padding_token, examples/sas_rec.py:463).
        mask = item_ids != 0
        last = jnp.maximum(
            jnp.sum(mask.astype(jnp.int32), axis=1) - 1, 0
        )
        return jnp.take_along_axis(
            states, last[:, None, None], axis=1
        )[:, 0]

    def score_items(self, user_repr: Tensor, item_ids: Tensor) -> Tensor:
        emb = self.item_embedding(item_ids)
        return jnp.sum(user_repr[:, None, :] * emb, axis=-1)

    def make_retrieval(self, k: int = 10) -> BruteForceRetrieval:
        return BruteForceRetrieval(
            self.item_embedding.embeddings, k=k
        )


def sasrec_loss(model: SASRec, batch: dict) -> Tensor:
    """Contrastive BCE on aligned positive/negative next-item sequences.

    batch: item_history [B, T], positive_sequence [B, T],
    negative_sequence [B, T] (parity: examples/sas_rec.py:520-561).
    """
    states = model.encode(batch["item_history"])  # [B, T, D]
    pos = model.item_embedding(batch["positive_sequence"])
    neg = model.item_embedding(batch["negative_sequence"])
    pos_logits = jnp.sum(states * pos, axis=-1)
    neg_logits = jnp.sum(states * neg, axis=-1)
    mask = (batch["positive_sequence"] != 0).astype(jnp.float32)

    def bce(logits, labels):
        return (
            jnp.maximum(logits, 0.0)
            - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    losses = bce(pos_logits, 1.0) + bce(neg_logits, 0.0)
    return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)
