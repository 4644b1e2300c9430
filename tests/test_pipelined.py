"""Pipelined (one-step-stale) embedding execution: semantics + training.

Parity target: the reference TF backend's
`pipeline_execution_with_tensor_core` (tensorflow/distributed_embedding.py:
49-50) — lookups overlap the dense compute and are one update old.
Contract tested here:
  * step 0 is bit-identical to the unpipelined step (activations primed
    fresh);
  * the activations consumed at step t+1 are gathered from the tables as
    they were BEFORE step t's update;
  * training still converges, embedding step counters advance, and the
    step runs under lax.scan (static shapes, carry-threaded state).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.data import synthetic
from keras_rs_tpu.models.dlrm import DLRMConfig, DLRMDCNv2, bce_loss
from keras_rs_tpu.parallel import mesh as mesh_lib

B = 64


def make_model(seed=0, devices=None, max_ids=64):
    cfg = DLRMConfig(
        vocab_sizes=[5000, 100, 3000, 50],
        multi_hot_sizes=[3, 1, 1, 2],
        num_dense_features=13,
        embedding_dim=16,
        bottom_mlp=(32, 16),
        top_mlp=(64, 16, 1),
        num_dcn_layers=2,
        dcn_projection_dim=8,
        embedding_threshold=1000,
        max_ids_per_partition=max_ids,
        max_unique_ids_per_partition=max_ids,
        learning_rate=0.01,
        global_batch_size=B,
        table_placement="sharded",
        # f32-resident dense: these tests assert scan-vs-loop and
        # cross-mesh CONSISTENCY at tight tolerances; the bf16-resident
        # default (round 5) legitimately drifts a few ULP across
        # fusion-boundary changes, which is not what they test.
        dense_output_dtype="float32",
    )
    mesh = mesh_lib.create_mesh(devices=devices)
    model = DLRMDCNv2(cfg, key=jax.random.key(seed), mesh=mesh)
    return model, cfg, mesh


def make_pre(model, cfg, seed=0):
    raw = synthetic.criteo_like_batch(
        B,
        vocab_sizes=cfg.vocab_sizes,
        multi_hot_sizes=cfg.multi_hot_sizes,
        seed=seed,
    )
    return model.preprocess(raw)


def leaves_allclose(a, b, atol=0.0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, dtype=np.float64),
            np.asarray(y, dtype=np.float64),
            atol=atol,
            rtol=0.0,
        )


def test_step0_matches_unpipelined():
    model, cfg, mesh = make_model()
    embed_fn, get_pre, inject = training.dlrm_pipeline_fns()
    batch0 = make_pre(model, cfg, seed=0)

    normal = training.create_train_state(model, optax.adagrad(0.01))
    nstep = training.make_train_step(
        bce_loss, optax.adagrad(0.01), donate=False
    )
    normal, nloss = nstep(normal, batch0)

    pstate = training.create_pipelined_train_state(
        model, optax.adagrad(0.01), get_pre(batch0), embed_fn
    )
    pstep = training.make_pipelined_train_step(
        bce_loss, optax.adagrad(0.01), embed_fn, get_pre, inject,
        donate=False,
    )
    pstate, ploss = pstep(pstate, batch0, get_pre(batch0))

    assert float(nloss) == float(ploss)
    # Identical parameter state after step 0: staleness only starts at
    # step 1 (the primed activations are fresh).
    leaves_allclose(normal.model, pstate.model, atol=1e-6)


def test_prefetched_acts_are_one_update_old():
    model, cfg, mesh = make_model()
    embed_fn, get_pre, inject = training.dlrm_pipeline_fns()
    batch0 = make_pre(model, cfg, seed=0)
    batch1 = make_pre(model, cfg, seed=1)

    pstate = training.create_pipelined_train_state(
        model, optax.adagrad(0.01), get_pre(batch0), embed_fn
    )
    pstep = training.make_pipelined_train_step(
        bce_loss, optax.adagrad(0.01), embed_fn, get_pre, inject,
        donate=False,
    )
    pstate, _ = pstep(pstate, batch0, get_pre(batch1))

    # The prefetch for batch 1 must read the tables as they were BEFORE
    # step 0's update — i.e. the initial model.
    stale_oracle = jax.jit(lambda m, p: embed_fn(m, p))(
        model, get_pre(batch1)
    )
    leaves_allclose(pstate.prefetched, stale_oracle, atol=1e-6)

    # And it must differ from a fresh gather off the updated tables
    # (touched rows moved).
    fresh = jax.jit(lambda m, p: embed_fn(m, p))(
        pstate.model, get_pre(batch1)
    )
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(pstate.prefetched),
            jax.tree_util.tree_leaves(fresh),
        )
    ]
    assert max(diffs) > 0.0, diffs


def test_pipelined_training_converges():
    model, cfg, mesh = make_model()
    embed_fn, get_pre, inject = training.dlrm_pipeline_fns()
    batches = [make_pre(model, cfg, seed=i % 2) for i in range(10)]

    pstate = training.create_pipelined_train_state(
        model, optax.adagrad(0.01), get_pre(batches[0]), embed_fn
    )
    pstep = training.make_pipelined_train_step(
        bce_loss, optax.adagrad(0.01), embed_fn, get_pre, inject,
        donate=False,
    )
    losses = []
    for t, batch in enumerate(batches):
        nxt = batches[min(t + 1, len(batches) - 1)]
        pstate, loss = pstep(pstate, batch, get_pre(nxt))
        losses.append(float(loss))
    assert losses[-2] < losses[0], losses
    assert losses[-1] < losses[1], losses
    emb = pstate.model.embedding_layer
    for stack in emb.stacks:
        assert float(emb.state.value[stack.name]["step"]) == len(batches)


def test_prefetch_is_dense_independent():
    """The overlap claim, proven at the compiler level: slicing the step
    to its `prefetched` output must DCE EVERY matmul (the full step
    compiles ~25 dots on this shape; the prefetch-only program compiles
    zero). No dataflow edge from the dense stack to the prefetch is what
    lets XLA's async scheduler run the gather + exchange collectives
    under the dense compute on real meshes."""
    import re

    model, cfg, mesh = make_model()
    embed_fn, get_pre, inject = training.dlrm_pipeline_fns()
    b0 = make_pre(model, cfg, seed=0)
    pstate = training.create_pipelined_train_state(
        model, optax.adagrad(0.01), get_pre(b0), embed_fn
    )
    raw = training.make_pipelined_train_step(
        bce_loss, optax.adagrad(0.01), embed_fn, get_pre, inject,
        donate=False, jit=False,
    )

    def ndots(fn):
        txt = (
            jax.jit(fn)
            .lower(pstate, b0, get_pre(b0))
            .compile()
            .as_text()
        )
        return len(re.findall(r"= .*dot\(", txt))

    def prefetch_only(s, b, nxt):
        ns, _ = raw(s, b, nxt)
        return ns.prefetched

    assert ndots(lambda s, b, n: raw(s, b, n)) > 10
    assert ndots(prefetch_only) == 0


def test_pipelined_cross_mesh_agreement():
    """SPMD correctness: the pipelined step's losses and post-run state
    must agree between a 1-device and the 8-device mesh (parity protocol
    of dryrun_multichip; padded-vocab init differs per shard count, so
    logical tables are transplanted)."""
    rng = np.random.default_rng(7)
    tables = {
        "table_0": (rng.normal(size=(5000, 16)) * 0.05).astype(np.float32),
        "table_2": (rng.normal(size=(3000, 16)) * 0.05).astype(np.float32),
    }
    raws = [
        synthetic.criteo_like_batch(
            B,
            vocab_sizes=[5000, 100, 3000, 50],
            multi_hot_sizes=[3, 1, 1, 2],
            seed=100 + i,
        )
        for i in range(4)
    ]

    def run(devices):
        # max_ids=512: a 1-device mesh funnels every id into one
        # partition, so the 8-device capacity (64) would truncate there.
        model, cfg, _ = make_model(devices=devices, max_ids=512)
        model.embedding_layer.set_embedding_tables(tables)
        embed_fn, get_pre, inject = training.dlrm_pipeline_fns()
        batches = [model.preprocess(dict(r)) for r in raws]
        pstate = training.create_pipelined_train_state(
            model, optax.adagrad(0.01), get_pre(batches[0]), embed_fn
        )
        pstep = training.make_pipelined_train_step(
            bce_loss, optax.adagrad(0.01), embed_fn, get_pre, inject,
            donate=False,
        )
        losses = []
        for t, batch in enumerate(batches):
            nxt = batches[min(t + 1, len(batches) - 1)]
            pstate, loss = pstep(pstate, batch, get_pre(nxt))
            losses.append(float(loss))
        kernel = np.asarray(pstate.model.top_mlp.layers[-1].kernel)
        tabs = pstate.model.embedding_layer.get_embedding_tables()
        return losses, kernel, tabs

    losses1, kernel1, tabs1 = run(jax.devices()[:1])
    losses8, kernel8, tabs8 = run(jax.devices())
    np.testing.assert_allclose(losses1, losses8, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(kernel1, kernel8, rtol=1e-4, atol=1e-5)
    for name in tables:
        np.testing.assert_allclose(
            tabs1[name], tabs8[name], rtol=1e-4, atol=1e-5,
            err_msg=f"{name}: pipelined post-run tables diverge across "
            "meshes",
        )


def test_pipelined_step_runs_under_scan():
    model, cfg, mesh = make_model()
    embed_fn, get_pre, inject = training.dlrm_pipeline_fns()
    batches = [make_pre(model, cfg, seed=i % 2) for i in range(4)]

    pstate = training.create_pipelined_train_state(
        model, optax.adagrad(0.01), get_pre(batches[0]), embed_fn
    )
    body = training.make_pipelined_train_step(
        bce_loss, optax.adagrad(0.01), embed_fn, get_pre, inject,
        donate=False, jit=False,
    )

    # Reference: eager per-step loop.
    ref_state, ref_losses = pstate, []
    for t, batch in enumerate(batches):
        nxt = batches[min(t + 1, len(batches) - 1)]
        ref_state, loss = body(ref_state, batch, get_pre(nxt))
        ref_losses.append(float(loss))

    # Scan: stack the batches (and the shifted next-pre stream).
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *batches
    )
    nexts = [
        get_pre(batches[min(t + 1, len(batches) - 1)])
        for t in range(len(batches))
    ]
    stacked_next = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *nexts
    )

    def scan_body(carry, xs):
        batch, nxt = xs
        carry, loss = body(carry, batch, nxt)
        return carry, loss

    final, losses = jax.jit(
        lambda s, xs: jax.lax.scan(scan_body, s, xs)
    )(pstate, (stacked, stacked_next))
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(ref_losses), rtol=2e-5
    )
    leaves_allclose(final.model, ref_state.model, atol=1e-5)
