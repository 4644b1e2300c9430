"""Worker script for the 2-process multi-host simulation test.

Run by tests/test_multihost.py as:
    python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices to a global 8-device mesh,
builds the SAME DistributedEmbedding, feeds its HOST SHARD of a global
batch, and runs jitted train steps — the multi-host pattern of the
reference's ml_perf workload (per-process data sharding with identical
seeded shuffles, examples/ml_perf/dataloader.py:210-234; cross-host stat
sync via process_allgather, jax/distributed_embedding.py:663).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    import jax.numpy as jnp
    import numpy as np
    import optax

    from keras_rs_tpu import training
    from keras_rs_tpu.layers.embedding.config import (
        FeatureConfig,
        TableConfig,
    )
    from keras_rs_tpu.layers.embedding.distributed_embedding import (
        DistributedEmbedding,
    )
    from keras_rs_tpu.parallel import mesh as mesh_lib, multihost

    mesh = mesh_lib.create_mesh()  # all 8 global devices
    B = 32  # global batch
    table = TableConfig(
        name="t",
        vocabulary_size=997,
        embedding_dim=8,
        combiner="mean",
        placement="sharded",
        optimizer="adagrad",
        max_ids_per_partition=64,
        max_unique_ids_per_partition=64,
    )
    fc = FeatureConfig(
        name="f", table=table, input_shape=(B, 3), output_shape=(B, 8)
    )
    layer = DistributedEmbedding(
        {"f": fc}, key=jax.random.key(0), mesh=mesh
    )

    # Identical seeded global batch; each process materializes only its
    # host shard and forms the global array from per-host shards.
    rng = np.random.default_rng(123)
    ids_global = rng.integers(0, 997, (B, 3))
    target_global = rng.normal(size=(B, 8)).astype(np.float32)
    lo = process_id * (B // num_processes)
    hi = lo + B // num_processes
    batch = multihost.global_batch_from_host_shards(
        mesh,
        {
            "ids": ids_global[lo:hi],
            "target": target_global[lo:hi],
        },
    )

    def loss_fn(m, b):
        acts = m(m.preprocess_on_device({"f": b["ids"]}))["f"]
        return jnp.mean((acts - b["target"]) ** 2)

    opt = optax.sgd(0.1)
    state = training.create_train_state(layer, opt)
    step = training.make_train_step(loss_fn, opt, donate=False)
    losses = []
    for _ in range(5):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    # Cross-host stat sync: each process reports a different local max;
    # additive keys are summed, watermarks maxed.
    synced = multihost.sync_max_stats(
        {"max_ids": 10 + process_id, "dropped_ids": 3}
    )
    assert synced["max_ids"] == 10 + num_processes - 1, synced
    assert synced["dropped_ids"] == 3 * num_processes, synced

    # Auto-grow under multi-host: every process preprocesses a training
    # batch that overflows the configured capacities; the stat sync runs
    # as a matched collective on all hosts and every host must derive
    # the SAME grown capacities (they are static shapes of the jitted
    # step — divergence would break SPMD). Parity:
    # jax/distributed_embedding.py:658-719.
    import warnings

    grow_table = TableConfig(
        name="g",
        vocabulary_size=997,
        embedding_dim=8,
        combiner="sum",
        placement="sharded",
        optimizer="sgd",
        max_ids_per_partition=2,
        max_unique_ids_per_partition=4,
    )
    grow_layer = DistributedEmbedding(
        {
            "g": FeatureConfig(
                name="g", table=grow_table, input_shape=(B, 3),
                output_shape=(B, 8),
            )
        },
        key=jax.random.key(1),
        mesh=mesh,
    )
    skew = np.full((B, 3), 5, np.int64)  # every id -> one shard
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no drop warnings allowed
        grow_layer.preprocess({"g": skew}, training=True)
    gstack = grow_layer.stacks[0]
    assert gstack.max_ids_per_partition > 2
    st = grow_layer.input_stats[gstack.name]
    assert st.dropped_ids == 0, st

    print(
        f"WORKER_OK {process_id} loss0={losses[0]:.6f} "
        f"lossN={losses[-1]:.6f} "
        f"grow=C{gstack.max_ids_per_partition}"
        f"U{gstack.max_unique_ids_per_shard}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
