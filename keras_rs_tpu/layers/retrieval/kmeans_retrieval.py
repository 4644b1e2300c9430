"""Approximate MIPS retrieval: k-means inverted file (IVF) on TPU.

The reference's ScaNN usage is example-level (examples/scann.py:219-238,
tree + asymmetric hashing + reorder, C++). The TPU-native equivalent keeps
everything as dense MXU work: candidates are partitioned by k-means
(trained with a few jitted Lloyd iterations), stored as a padded
[num_clusters, cluster_capacity, dim] tensor; a query scores the
centroids, picks `num_probes` clusters, gathers only those candidates and
scores them exactly. Complexity drops from O(N) to
O(num_clusters + num_probes * cluster_capacity) per query while staying
batched and compiler-friendly (no host-side trees).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from keras_rs_tpu.core.serialization import export
from keras_rs_tpu.layers.retrieval.retrieval import Retrieval
from keras_rs_tpu.types import Tensor

NEG_INF = float(np.finfo(np.float32).min / 2)


def kmeans(
    x: Tensor, num_clusters: int, *, key: jax.Array, iterations: int = 10
) -> Tensor:
    """Lloyd's k-means returning [num_clusters, dim] centroids (jitted)."""
    n = x.shape[0]
    init_idx = jax.random.choice(
        key, n, shape=(num_clusters,), replace=num_clusters > n
    )
    centroids = x[init_idx]

    @jax.jit
    def step(centroids):
        scores = (
            -2.0 * x @ centroids.T
            + jnp.sum(centroids**2, axis=1)[None, :]
        )
        assign = jnp.argmin(scores, axis=1)
        one_hot = jax.nn.one_hot(assign, num_clusters, dtype=x.dtype)
        counts = one_hot.sum(axis=0)
        sums = one_hot.T @ x
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Keep empty clusters where they were.
        return jnp.where(counts[:, None] > 0, new, centroids)

    for _ in range(iterations):
        centroids = step(centroids)
    return centroids


@export("keras_rs_tpu.layers.KMeansRetrieval")
class KMeansRetrieval(Retrieval):
    """IVF approximate top-k retrieval.

    Args:
        num_clusters: k-means partitions (default ~sqrt(N) at index time).
        num_probes: clusters searched per query; recall/latency knob.
    """

    non_trainable_fields = (
        "centroids",
        "cluster_candidates",
        "cluster_ids",
        "cluster_valid",
    )

    def __init__(
        self,
        candidate_embeddings: Tensor | None = None,
        candidate_ids: Tensor | None = None,
        k: int = 10,
        return_scores: bool = True,
        num_clusters: int | None = None,
        num_probes: int = 4,
        kmeans_iterations: int = 10,
        seed: int = 0,
        name: str | None = None,
    ) -> None:
        super().__init__(k=k, return_scores=return_scores, name=name)
        self.num_clusters = num_clusters
        self.num_probes = num_probes
        self.kmeans_iterations = kmeans_iterations
        self.seed = seed
        self.centroids = None
        self.cluster_candidates = None
        self.cluster_ids = None
        self.cluster_valid = None
        if candidate_embeddings is not None:
            self.update_candidates(candidate_embeddings, candidate_ids)

    def update_candidates(
        self,
        candidate_embeddings: Tensor,
        candidate_ids: Tensor | None = None,
    ) -> None:
        candidate_embeddings = jnp.asarray(
            candidate_embeddings, jnp.float32
        )
        self._validate_candidates(candidate_embeddings, candidate_ids)
        n, dim = candidate_embeddings.shape
        num_clusters = self.num_clusters or max(
            1, int(np.sqrt(n))
        )
        centroids = kmeans(
            candidate_embeddings,
            num_clusters,
            key=jax.random.key(self.seed),
            iterations=self.kmeans_iterations,
        )
        # Host-side index build: group candidates by nearest centroid.
        scores = np.asarray(
            -2.0 * candidate_embeddings @ centroids.T
            + jnp.sum(centroids**2, axis=1)[None, :]
        )
        assign = scores.argmin(axis=1)
        counts = np.bincount(assign, minlength=num_clusters)
        capacity = int(counts.max())
        grouped = np.zeros((num_clusters, capacity, dim), np.float32)
        ids = (
            np.asarray(candidate_ids)
            if candidate_ids is not None
            else np.arange(n)
        ).astype(np.int32)
        grouped_ids = np.zeros((num_clusters, capacity), np.int32)
        valid = np.zeros((num_clusters, capacity), bool)
        order = np.argsort(assign, kind="stable")
        offsets = np.zeros(num_clusters, np.int64)
        sorted_assign = assign[order]
        within = np.arange(n) - np.searchsorted(
            sorted_assign, sorted_assign
        )
        grouped[sorted_assign, within] = np.asarray(
            candidate_embeddings
        )[order]
        grouped_ids[sorted_assign, within] = ids[order]
        valid[sorted_assign, within] = True
        del offsets

        self.centroids = centroids
        self.cluster_candidates = jnp.asarray(grouped)
        self.cluster_ids = jnp.asarray(grouped_ids)
        self.cluster_valid = jnp.asarray(valid)

    def __call__(self, inputs: Tensor) -> Any:
        if self.centroids is None:
            raise ValueError(
                "No candidates. Call `update_candidates` first."
            )
        num_probes = min(self.num_probes, self.centroids.shape[0])
        # Stage 1: route to clusters by centroid dot product.
        centroid_scores = self.compute_score(inputs, self.centroids)
        _, probe = jax.lax.top_k(centroid_scores, num_probes)  # [B, P]

        # Stage 2: exact scores within probed clusters.
        cands = self.cluster_candidates[probe]  # [B, P, cap, D]
        ids = self.cluster_ids[probe]  # [B, P, cap]
        valid = self.cluster_valid[probe]
        B = inputs.shape[0]
        scores = jnp.einsum(
            "bd,bpcd->bpc", inputs, cands,
            preferred_element_type=inputs.dtype,
        )
        scores = jnp.where(valid, scores, NEG_INF)
        flat_scores = scores.reshape(B, -1)
        flat_ids = ids.reshape(B, -1)
        k = min(self.k, flat_scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)
        top_ids = jnp.take_along_axis(flat_ids, top_idx, axis=1)
        if self.return_scores:
            return top_scores, top_ids
        return top_ids

    def get_config(self) -> dict[str, Any]:
        config = super().get_config()
        config.update(
            {
                "num_clusters": self.num_clusters,
                "num_probes": self.num_probes,
                "kmeans_iterations": self.kmeans_iterations,
                "seed": self.seed,
            }
        )
        return config
