"""Two-tower retrieval model.

Capability parity with the reference's basic_retrieval / data_parallel
examples (examples/basic_retrieval.py:218-307): a query tower and a
candidate tower producing embeddings whose dot product scores candidates.
Supports in-batch-negatives softmax training and brute-force top-k
inference.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from keras_rs_tpu.core.module import Module
from keras_rs_tpu.layers.dense import MLP
from keras_rs_tpu.layers.embedding.embed_reduce import EmbedReduce
from keras_rs_tpu.layers.retrieval.retrieval import BruteForceRetrieval
from keras_rs_tpu.types import Tensor


class TwoTower(Module):
    """Embedding towers for (user, item) retrieval.

    Plain embedding towers by default; optional MLP heads for the "deep
    recommender" variant.
    """

    def __init__(
        self,
        num_queries: int,
        num_candidates: int,
        embedding_dim: int,
        *,
        key: jax.Array,
        tower_units: tuple[int, ...] = (),
        dtype: Any = jnp.float32,
    ) -> None:
        kq, kc, kqm, kcm = jax.random.split(key, 4)
        self.query_embedding = EmbedReduce(
            num_queries, embedding_dim, key=kq, dtype=dtype
        )
        self.candidate_embedding = EmbedReduce(
            num_candidates, embedding_dim, key=kc, dtype=dtype
        )
        if tower_units:
            self.query_mlp = MLP(
                embedding_dim, tower_units, key=kqm, dtype=dtype
            )
            self.candidate_mlp = MLP(
                embedding_dim, tower_units, key=kcm, dtype=dtype
            )
        else:
            self.query_mlp = None
            self.candidate_mlp = None
        self.num_queries = num_queries
        self.num_candidates = num_candidates
        self.embedding_dim = embedding_dim

    def query_tower(self, query_ids: Tensor) -> Tensor:
        e = self.query_embedding(query_ids)
        return self.query_mlp(e) if self.query_mlp is not None else e

    def candidate_tower(self, candidate_ids: Tensor) -> Tensor:
        e = self.candidate_embedding(candidate_ids)
        return (
            self.candidate_mlp(e) if self.candidate_mlp is not None else e
        )

    def __call__(self, query_ids: Tensor, candidate_ids: Tensor) -> Tensor:
        """Per-pair scores: dot(query_emb, candidate_emb)."""
        q = self.query_tower(query_ids)
        c = self.candidate_tower(candidate_ids)
        return jnp.sum(q * c, axis=-1)

    def in_batch_scores(
        self, query_ids: Tensor, candidate_ids: Tensor
    ) -> Tensor:
        """(B, B) score matrix of each query against the batch candidates."""
        q = self.query_tower(query_ids)
        c = self.candidate_tower(candidate_ids)
        return jnp.matmul(q, c.T, preferred_element_type=q.dtype)

    def make_retrieval(
        self, k: int = 10, candidate_ids: Tensor | None = None
    ) -> BruteForceRetrieval:
        """Builds a brute-force retrieval head over ALL candidates."""
        all_ids = jnp.arange(self.num_candidates)
        candidates = self.candidate_tower(all_ids)
        return BruteForceRetrieval(candidates, candidate_ids, k=k)


def in_batch_softmax_loss(
    model: TwoTower,
    query_ids: Tensor,
    candidate_ids: Tensor,
    sampling_probability: Tensor | None = None,
) -> Tensor:
    """In-batch sampled softmax: positives on the diagonal.

    Matches the training recipe of examples/sequential_retrieval.py:343-359
    (CCE against an identity label matrix).
    """
    scores = model.in_batch_scores(query_ids, candidate_ids)
    if sampling_probability is not None:
        scores = scores - jnp.log(
            jnp.clip(sampling_probability, 1e-6, 1.0)
        )
    labels = jnp.arange(scores.shape[0])
    logprobs = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(
        jnp.take_along_axis(logprobs, labels[:, None], axis=-1)
    )
