"""Benchmark: DLRM-DCNv2 train step throughput on the available chip.

Compares the TPU-native sharded embedding path (fused in-kernel optimizer,
O(unique_ids) updates) against the naive JAX baseline (dense autodiff
embedding gradients + full-table optax update — what you get without a
SparseCore-class embedding engine). Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline = our examples/s divided by the naive baseline's examples/s on
the same chip and model shape (the reference publishes no numbers,
BASELINE.md; roofline/naive-relative is the protocol).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build(placement: str, mesh, batch_size: int, vocab: int, dim: int):
    import jax
    import optax

    num_shards = mesh.devices.size

    from keras_rs_tpu import training
    from keras_rs_tpu.data import synthetic
    from keras_rs_tpu.models.dlrm import DLRMConfig, DLRMDCNv2, bce_loss
    from keras_rs_tpu.parallel import mesh as mesh_lib

    cfg = DLRMConfig(
        vocab_sizes=[vocab, vocab // 2, 2000, 500],
        multi_hot_sizes=[3, 2, 1, 1],
        num_dense_features=13,
        embedding_dim=dim,
        bottom_mlp=(512, 256, dim),
        top_mlp=(1024, 512, 256, 1),
        num_dcn_layers=3,
        dcn_projection_dim=256,
        embedding_threshold=21_000,
        # Worst-case per-bucket capacity so NO ids are dropped:
        # sum_f (B / D) * multi_hot_f for the large-table stack.
        max_ids_per_partition=(batch_size // num_shards) * 5,
        max_unique_ids_per_partition=(batch_size // num_shards) * 5
        // max(1, num_shards),
        learning_rate=0.0034,
        global_batch_size=batch_size,
        table_placement=placement,
    )
    model = DLRMDCNv2(cfg, key=jax.random.key(0), mesh=mesh)
    raw = synthetic.criteo_like_batch(
        batch_size,
        vocab_sizes=cfg.vocab_sizes,
        multi_hot_sizes=cfg.multi_hot_sizes,
        seed=0,
    )
    pre = model.preprocess(raw, training=False)
    for key in list(pre):
        if key in ("dense", "label") or key.startswith("cat_"):
            pre[key] = mesh_lib.put_batch(mesh, np.asarray(pre[key]))

    optimizer = optax.adagrad(cfg.learning_rate)
    state = training.create_train_state(model, optimizer)
    step = training.make_train_step(bce_loss, optimizer)
    return state, step, pre


def time_steps(state, step, pre, warmup: int, iters: int) -> float:
    import jax

    for _ in range(warmup):
        state, loss = step(state, pre)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, pre)
    jax.block_until_ready(loss)
    return time.perf_counter() - t0


def main() -> None:
    from keras_rs_tpu.parallel import mesh as mesh_lib

    batch_size = int(os.environ.get("BENCH_BATCH", 8192))
    vocab = int(os.environ.get("BENCH_VOCAB", 4_000_000))
    dim = int(os.environ.get("BENCH_DIM", 128))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    mesh = mesh_lib.create_mesh()

    state, step, pre = build("sharded", mesh, batch_size, vocab, dim)
    elapsed = time_steps(state, step, pre, warmup=3, iters=iters)
    ours = batch_size * iters / elapsed
    del state, step, pre

    state, step, pre = build(
        "default_device", mesh, batch_size, vocab, dim
    )
    elapsed_naive = time_steps(state, step, pre, warmup=3, iters=iters)
    naive = batch_size * iters / elapsed_naive

    print(
        json.dumps(
            {
                "metric": "dlrm_dcnv2_train_examples_per_sec",
                "value": round(ours, 1),
                "unit": "examples/s",
                "vs_baseline": round(ours / naive, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
