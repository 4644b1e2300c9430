"""Golden-math tests for the sharded embedding subsystem.

Mirrors the reference's oracle strategy (keras_rs/src/layers/embedding/
test_utils.py: numpy sparse-dense matmul as ground truth, jax/test_utils.py
for expected gradients and optimizer updates): stacking layout round-trip,
COO preprocessing, all-to-all lookup forward, fused-optimizer backward —
all on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu.layers.embedding import optimizers as opt_lib
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.lookup import (
    init_stack_state,
    split_activations,
    stack_lookup,
)
from keras_rs_tpu.layers.embedding.preprocessing import preprocess_stack
from keras_rs_tpu.layers.embedding.stacking import (
    build_stacks,
    gather_table,
    init_stack_table,
    scatter_table,
)
from keras_rs_tpu.parallel import mesh as mesh_lib

D = 8
B = 16
AXIS = "data"


def make_configs(optimizer="sgd", combiner="mean"):
    t_movie = TableConfig(
        name="movie", vocabulary_size=50, embedding_dim=6,
        optimizer=optimizer, combiner=combiner,
        max_ids_per_partition=16, max_unique_ids_per_partition=16,
    )
    t_user = TableConfig(
        name="user", vocabulary_size=30, embedding_dim=8,
        optimizer=optimizer, combiner="sum",
        max_ids_per_partition=16, max_unique_ids_per_partition=16,
    )
    fcs = [
        FeatureConfig("movie_hist", t_movie, (B, 3), (B, 6)),
        FeatureConfig("movie_id", t_movie, (B,), (B, 6)),
        FeatureConfig("user_id", t_user, (B, 2), (B, 8)),
    ]
    return fcs


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    inputs = {
        "movie_hist": rng.integers(0, 50, size=(B, 3)),
        "movie_id": rng.integers(0, 50, size=(B,)),
        "user_id": rng.integers(0, 30, size=(B, 2)),
    }
    weights = {
        "movie_hist": (rng.random((B, 3)) > 0.3).astype(np.float32),
        "user_id": rng.random((B, 2)).astype(np.float32),
    }
    return inputs, weights


def oracle_activations(tables, fcs, inputs, weights):
    """Numpy golden lookup (no sharding, no stacking)."""
    out = {}
    for fc in fcs:
        t = fc.table
        ids = np.asarray(inputs[fc.name])
        if ids.ndim == 1:
            ids = ids[:, None]
        w = weights.get(fc.name) if weights else None
        w = np.ones(ids.shape, np.float32) if w is None else np.asarray(w)
        if w.ndim == 1:
            w = w[:, None]
        emb = tables[t.name][ids] * w[..., None]
        s = emb.sum(axis=1)
        if t.combiner == "mean":
            div = w.sum(axis=1)
        elif t.combiner == "sqrtn":
            div = np.sqrt((w**2).sum(axis=1))
        else:
            div = np.ones(ids.shape[0])
        div[div == 0] = 1.0
        out[fc.name] = s / div[:, None]
    return out


def setup_stack(fcs, seed=1):
    mesh = mesh_lib.create_mesh()
    stacks = build_stacks(fcs, D, stacking="auto")
    rng = np.random.default_rng(seed)
    raw_tables = {}
    for stack in stacks:
        for ts in stack.tables:
            raw_tables[ts.name] = rng.normal(
                size=(ts.vocabulary_size, ts.embedding_dim)
            ).astype(np.float32)
    states = {}
    for stack in stacks:
        buf = np.zeros((stack.global_rows, stack.stack_dim), np.float32)
        for ts in stack.tables:
            buf = scatter_table(stack, buf, ts.name, raw_tables[ts.name])
        table = jax.device_put(buf, mesh_lib.table_sharding(mesh))
        states[stack.name] = init_stack_state(stack, table)
    return mesh, stacks, states, raw_tables


def put_coo(mesh, coo):
    sharding = mesh_lib.batch_sharding(mesh)
    return {
        k: jax.device_put(v, sharding) for k, v in coo.arrays().items()
    }


def test_stacking_roundtrip():
    fcs = make_configs()
    _, stacks, _, raw = setup_stack(fcs)
    for stack in stacks:
        for ts in stack.tables:
            buf = np.zeros(
                (stack.global_rows, stack.stack_dim), np.float32
            )
            buf = scatter_table(stack, buf, ts.name, raw[ts.name])
            back = gather_table(stack, buf, ts.name)
            np.testing.assert_array_equal(back, raw[ts.name])


def test_auto_stacking_groups_same_dim_pad():
    fcs = make_configs()
    stacks = build_stacks(fcs, D, stacking="auto")
    # movie dim 6 -> pad 8, user dim 8 -> pad 8, same sgd optimizer: fused.
    assert len(stacks) == 1
    assert stacks[0].stack_dim == 8
    assert len(stacks[0].tables) == 2
    assert stacks[0].num_features == 3
    stacks_never = build_stacks(fcs, D, stacking="never")
    assert len(stacks_never) == 2


def test_preprocess_stats_and_padding():
    fcs = make_configs()
    stacks = build_stacks(fcs, D)
    inputs, weights = make_inputs()
    coo, stats = preprocess_stack(stacks[0], inputs, weights)
    assert coo.send_slots.shape == (D, D, 16)
    assert stats.dropped_ids == 0
    assert stats.max_ids_per_bucket <= 16
    # Padding entries have zero gains and point at the sink slot.
    pad = coo.send_gains == 0
    assert (coo.send_slots[pad] == stacks[0].sink_slot).all()


@pytest.mark.parametrize("combiner", ["mean", "sum", "sqrtn"])
def test_forward_matches_oracle(combiner):
    fcs = make_configs(combiner=combiner)
    mesh, stacks, states, raw = setup_stack(fcs)
    stack = stacks[0]
    inputs, weights = make_inputs()
    coo, _ = preprocess_stack(stack, inputs, weights)
    coo_dev = put_coo(mesh, coo)

    @jax.jit
    def fwd(state, coo_dev):
        acts = stack_lookup(stack, mesh, AXIS, state, coo_dev)
        return split_activations(stack, acts)

    acts = fwd(states[stack.name], coo_dev)
    expected = oracle_activations(raw, fcs, inputs, weights)
    for fc in fcs:
        np.testing.assert_allclose(
            np.asarray(acts[fc.name]),
            expected[fc.name],
            rtol=1e-5,
            atol=1e-5,
            err_msg=fc.name,
        )


def oracle_row_grads(fcs, inputs, weights, cotangents):
    """Expected d(loss)/d(table rows) for loss = sum(acts * cotangents)."""
    grads = {
        fc.table.name: np.zeros(
            (fc.table.vocabulary_size, fc.table.embedding_dim), np.float64
        )
        for fc in fcs
    }
    for fc in fcs:
        t = fc.table
        ids = np.asarray(inputs[fc.name])
        if ids.ndim == 1:
            ids = ids[:, None]
        w = weights.get(fc.name) if weights else None
        w = np.ones(ids.shape, np.float32) if w is None else np.asarray(w)
        if w.ndim == 1:
            w = w[:, None]
        if t.combiner == "mean":
            div = w.sum(axis=1)
        elif t.combiner == "sqrtn":
            div = np.sqrt((w**2).sum(axis=1))
        else:
            div = np.ones(ids.shape[0])
        div[div == 0] = 1.0
        c = np.asarray(cotangents[fc.name])  # [B, dim]
        for b in range(ids.shape[0]):
            for l in range(ids.shape[1]):
                if w[b, l] != 0:
                    grads[t.name][ids[b, l]] += (
                        w[b, l] / div[b]
                    ) * c[b]
    return grads


@pytest.mark.parametrize(
    "optimizer", ["sgd", "adagrad", "rowwise_adagrad", "adam", "ftrl"]
)
def test_backward_fused_update_matches_oracle(optimizer):
    fcs = make_configs(optimizer=optimizer)
    mesh, stacks, states, raw = setup_stack(fcs)
    stack = stacks[0]
    inputs, weights = make_inputs()
    coo, _ = preprocess_stack(stack, inputs, weights)
    coo_dev = put_coo(mesh, coo)

    rng = np.random.default_rng(7)
    cotangents = {
        fc.name: rng.normal(size=(B, fc.table.embedding_dim)).astype(
            np.float32
        )
        for fc in fcs
    }

    def loss_fn(state):
        acts = stack_lookup(stack, mesh, AXIS, state, coo_dev)
        feats = split_activations(stack, acts)
        return sum(
            jnp.sum(feats[fc.name] * cotangents[fc.name]) for fc in fcs
        )

    new_state = jax.jit(jax.grad(loss_fn))(states[stack.name])

    # Step counter cotangent: step + 1.
    np.testing.assert_allclose(float(new_state["step"]), 1.0)

    # Expected updated tables: optimizer applied to touched rows.
    expected_grads = oracle_row_grads(fcs, inputs, weights, cotangents)
    opt = opt_lib.get(optimizer)
    for ts in stack.tables:
        g = expected_grads[ts.name].astype(np.float32)
        touched = (np.abs(g).sum(axis=1) > 0)
        rows = raw[ts.name]
        slots = {
            name: np.asarray(
                opt.init_slot(
                    name,
                    rows.shape[:1]
                    if name in opt.rowwise_slots
                    else rows.shape,
                    jnp.float32,
                )
            )
            for name in opt.slot_names
        }
        exp_rows, _ = opt.apply(
            jnp.asarray(rows), jnp.asarray(g),
            {k: jnp.asarray(v) for k, v in slots.items()},
            jnp.zeros(()),
        )
        exp_rows = np.asarray(exp_rows)
        got = gather_table(stack, np.asarray(new_state["table"]), ts.name)
        # Touched rows: fused update must match the oracle update.
        np.testing.assert_allclose(
            got[touched], exp_rows[touched], rtol=5e-4, atol=5e-5,
            err_msg=f"{ts.name} touched rows",
        )
        # Untouched rows unchanged.
        np.testing.assert_allclose(
            got[~touched], rows[~touched], rtol=1e-6,
            err_msg=f"{ts.name} untouched rows",
        )


def test_init_stack_table_sharded():
    fcs = make_configs()
    mesh = mesh_lib.create_mesh()
    stacks = build_stacks(fcs, D)
    stack = stacks[0]
    cfg_by_name = {fc.table.name: fc.table for fc in fcs}
    table = jax.jit(
        lambda k: init_stack_table(stack, cfg_by_name, k),
        out_shardings=mesh_lib.table_sharding(mesh),
    )(jax.random.key(0))
    assert table.shape == (stack.global_rows, stack.stack_dim)
    # Exported tables should have zero padding beyond embedding_dim and
    # plausible variance (VarianceScaling fan_out: std ~ 1/sqrt(dim)).
    movie = gather_table(stack, np.asarray(table), "movie")
    assert movie.shape == (50, 6)
    assert abs(movie.std() - 1.0 / np.sqrt(6)) < 0.15


def test_mixed_dim_stack_initializer_variance():
    """Fan-based init must use each TABLE's dim, not the stack's padded
    dim (review finding: a dim-16 table stacked with dim-128 was
    initialized ~2.8x too small)."""
    from keras_rs_tpu.core import initializers as init_lib
    from keras_rs_tpu.layers.embedding.stacking import gather_table

    small = TableConfig(
        name="small", vocabulary_size=4096, embedding_dim=16,
        initializer=init_lib.VarianceScaling(mode="fan_out"),
    )
    big = TableConfig(
        name="big", vocabulary_size=4096, embedding_dim=128,
        initializer=init_lib.VarianceScaling(mode="fan_out"),
    )
    fcs = [
        FeatureConfig(name="fs", table=small, input_shape=(8,),
                      output_shape=(8, 16)),
        FeatureConfig(name="fb", table=big, input_shape=(8,),
                      output_shape=(8, 128)),
    ]
    stacks = build_stacks(fcs, 1, stacking=[["small", "big"]])
    assert len(stacks) == 1 and stacks[0].stack_dim == 128
    table = init_stack_table(
        stacks[0], {"small": small, "big": big}, jax.random.key(0)
    )
    got_small = gather_table(stacks[0], np.asarray(table), "small")
    got_big = gather_table(stacks[0], np.asarray(table), "big")
    # VarianceScaling fan_out: std ~ sqrt(1/dim) per table.
    assert abs(got_small.std() / np.sqrt(1 / 16) - 1) < 0.15
    assert abs(got_big.std() / np.sqrt(1 / 128) - 1) < 0.15


def test_unique_overflow_does_not_update_sink():
    """Overflow entries' gradients are dropped (not raced into the sink
    row) — review finding on the unique-row scatter contract."""
    import warnings as _w

    t = TableConfig(
        name="t", vocabulary_size=5000, embedding_dim=8,
        optimizer="sgd", combiner="sum",
        max_ids_per_partition=64, max_unique_ids_per_partition=2,
    )
    fcs = [FeatureConfig("f", t, (B, 16), (B, 8))]
    mesh = mesh_lib.create_mesh()
    stacks = build_stacks(fcs, mesh.devices.size)
    stack = stacks[0]
    table = init_stack_table(stack, {"t": t}, jax.random.key(0))
    state = init_stack_state(stack, table)
    sink = stack.sink_slot
    table_before = np.asarray(state["table"])

    rng = np.random.default_rng(0)
    inputs = {"f": rng.integers(0, 5000, (B, 16))}
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        coo, stats = preprocess_stack(stack, inputs, None)
    assert stats.dropped_ids > 0  # overflow actually happened

    coo_dev = {k: jnp.asarray(v) for k, v in coo.arrays().items()}

    def loss(ts):
        acts = stack_lookup(stack, mesh, AXIS, ts, coo_dev)
        return jnp.sum(acts)

    new_state = jax.jit(jax.grad(loss))(state)
    new_table = np.asarray(new_state["table"])
    D_ = stack.num_shards
    rows_per = stack.rows_per_shard
    for d in range(D_):
        sink_row = d * rows_per + sink
        np.testing.assert_array_equal(
            new_table[sink_row], table_before[sink_row],
            err_msg=f"sink row of shard {d} must not update",
        )


def test_rowwise_adagrad_hand_math():
    """Independent numpy formula (not opt.apply as its own oracle):
    acc += sum(g^2, -1);  w -= lr * g / (sqrt(acc) + eps)."""
    rng = np.random.default_rng(11)
    rows = rng.normal(size=(5, 8)).astype(np.float32)
    g = rng.normal(size=(5, 8)).astype(np.float32)
    opt = opt_lib.RowWiseAdagrad(learning_rate=0.5)
    acc0 = np.asarray(
        opt.init_slot("accumulator", (5,), jnp.float32)
    )
    np.testing.assert_allclose(acc0, 0.1)  # Keras/TPUEmbedding init
    new_rows, new_slots = opt.apply(
        jnp.asarray(rows), jnp.asarray(g),
        {"accumulator": jnp.asarray(acc0)}, jnp.zeros(()),
    )
    exp_acc = acc0 + (g**2).sum(axis=-1)
    exp_rows = rows - 0.5 * g / (
        np.sqrt(exp_acc)[:, None] + opt.epsilon
    )
    np.testing.assert_allclose(
        np.asarray(new_slots["accumulator"]), exp_acc, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(new_rows), exp_rows, rtol=1e-6)


@pytest.mark.parametrize("optimizer", ["adagrad", "rowwise_adagrad", "adam"])
@pytest.mark.parametrize("dim", [8, 128])  # 8 = split layout, 128 = packed
def test_two_step_update_matches_oracle(optimizer, dim):
    """Slot state must CARRY between steps: after two fused updates the
    table must equal two sequential oracle optimizer applications (a
    step-1-only test cannot distinguish fresh slots from carried ones,
    e.g. Adam's bias correction or Adagrad's accumulator)."""
    t = TableConfig(
        name="t", vocabulary_size=64, embedding_dim=dim,
        optimizer=optimizer, combiner="sum",
        max_ids_per_partition=32, max_unique_ids_per_partition=32,
    )
    fcs = [FeatureConfig("f", t, (B, 2), (B, dim))]
    mesh, stacks, states, raw = setup_stack(fcs)
    stack = stacks[0]
    # Packed layout requires full-row slots; row-wise scalar slots keep
    # the split layout at any dim.
    assert stack.packed_state == (
        dim == 128 and optimizer != "rowwise_adagrad"
    )
    if optimizer == "rowwise_adagrad":
        acc = states[stack.name]["slots"]["accumulator"]
        assert acc.ndim == 1 and acc.shape[0] == stack.global_rows
    rng = np.random.default_rng(5)
    inputs = {"f": rng.integers(0, 64, size=(B, 2))}
    coo, _ = preprocess_stack(stack, inputs)
    coo_dev = put_coo(mesh, coo)
    cot = rng.normal(size=(B, dim)).astype(np.float32)

    def loss_fn(state):
        acts = stack_lookup(stack, mesh, AXIS, state, coo_dev)
        return jnp.sum(split_activations(stack, acts)["f"] * cot)

    grad = jax.jit(jax.grad(loss_fn))
    state = states[stack.name]
    state = grad(state)   # step 1
    state = grad(state)   # step 2 (same batch: same row grads)
    np.testing.assert_allclose(float(state["step"]), 2.0)

    # Oracle: apply the optimizer twice with carried slots.
    g = oracle_row_grads(fcs, inputs, None, {"f": cot})["t"].astype(
        np.float32
    )
    opt = opt_lib.get(optimizer)
    rows = jnp.asarray(raw["t"])
    slots = {
        name: opt.init_slot(
            name,
            rows.shape[:1] if name in opt.rowwise_slots else rows.shape,
            jnp.float32,
        )
        for name in opt.slot_names
    }
    rows, slots = opt.apply(rows, jnp.asarray(g), slots, jnp.zeros(()))
    rows, slots = opt.apply(rows, jnp.asarray(g), slots, jnp.ones(()))
    touched = np.abs(g).sum(axis=1) > 0
    got = gather_table(stack, np.asarray(state["table"]), "t")
    np.testing.assert_allclose(
        got[touched], np.asarray(rows)[touched], rtol=5e-4, atol=5e-5
    )


# --- construction-order forward (D == 1, round 5) -----------------------


def _big_capacity_configs(combiner="mean", optimizer="sgd"):
    t_movie = TableConfig(
        name="movie", vocabulary_size=50, embedding_dim=6,
        optimizer=optimizer, combiner=combiner,
        max_ids_per_partition=128, max_unique_ids_per_partition=128,
    )
    t_user = TableConfig(
        name="user", vocabulary_size=30, embedding_dim=8,
        optimizer=optimizer, combiner="sum",
        max_ids_per_partition=128, max_unique_ids_per_partition=128,
    )
    return [
        FeatureConfig("movie_hist", t_movie, (B, 3), (B, 6)),
        FeatureConfig("movie_id", t_movie, (B,), (B, 6)),
        FeatureConfig("user_id", t_user, (B, 2), (B, 8)),
    ]


def _setup_d1(fcs, seed=1):
    mesh = mesh_lib.create_mesh(jax.devices()[:1])
    stacks = build_stacks(fcs, 1, stacking="auto")
    rng = np.random.default_rng(seed)
    raw_tables = {}
    for stack in stacks:
        for ts in stack.tables:
            raw_tables[ts.name] = rng.normal(
                size=(ts.vocabulary_size, ts.embedding_dim)
            ).astype(np.float32)
    states = {}
    for stack in stacks:
        buf = np.zeros((stack.global_rows, stack.stack_dim), np.float32)
        for ts in stack.tables:
            buf = scatter_table(stack, buf, ts.name, raw_tables[ts.name])
        table = jax.device_put(buf, mesh_lib.table_sharding(mesh))
        states[stack.name] = init_stack_state(stack, table)
    return mesh, stacks, states, raw_tables


@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_construction_fwd_matches_sorted_and_oracle(combiner):
    """At D == 1 the forward consumes the construction-order arrays
    (dense per-feature reshape-sum). It must match the sorted
    segment-sum path closely and the numpy oracle, and the BACKWARD
    (which still consumes the sorted residuals) must produce the same
    table update either way."""
    fcs = _big_capacity_configs(combiner)
    mesh, stacks, states, raw = _setup_d1(fcs)
    stack = stacks[0]
    assert stack.construction_fwd, (
        stack.construction_entries, stack.max_ids_per_partition
    )
    inputs, weights = make_inputs()
    coo, _ = preprocess_stack(stack, inputs, weights)
    assert coo.fwd_slots is not None and coo.fwd_gains is not None
    assert coo.fwd_slots.shape == (1, stack.construction_entries)

    coo_all = put_coo(mesh, coo)
    coo_sorted = {
        k: v
        for k, v in coo_all.items()
        if k not in ("fwd_slots", "fwd_gains")
    }

    def loss_fn(state, coo_dev):
        acts = stack_lookup(stack, mesh, AXIS, state, coo_dev)
        return jnp.sum(acts * jnp.cos(jnp.arange(acts.size))
                       .reshape(acts.shape)), acts

    grad_fn = jax.jit(
        jax.grad(lambda s, c: loss_fn(s, c)[0], has_aux=False)
    )
    acts_c = jax.jit(lambda s, c: loss_fn(s, c)[1])(
        states[stack.name], coo_all
    )
    acts_s = jax.jit(lambda s, c: loss_fn(s, c)[1])(
        states[stack.name], coo_sorted
    )
    np.testing.assert_allclose(
        np.asarray(acts_c), np.asarray(acts_s), rtol=1e-5, atol=1e-5
    )
    expected = oracle_activations(raw, fcs, inputs, weights)
    split = split_activations(stack, acts_c)
    for fc in fcs:
        np.testing.assert_allclose(
            np.asarray(split[fc.name]), expected[fc.name],
            rtol=1e-5, atol=1e-5, err_msg=fc.name,
        )
    # Overwrite contract: the "gradient" is the updated state — must be
    # identical whichever forward ran (the backward only reads the
    # sorted residuals, which both forwards pass through).
    g_c = grad_fn(states[stack.name], coo_all)
    g_s = grad_fn(states[stack.name], coo_sorted)
    np.testing.assert_array_equal(
        np.asarray(g_c["table"]), np.asarray(g_s["table"])
    )


def test_construction_fwd_arrays_three_backend_parity():
    """fwd_slots/fwd_gains are part of the D == 1 contract: numpy,
    native C++ wrapper, and device backends must emit them
    bit-identically (the device fuzz suite covers more shapes; this
    pins the new arrays explicitly)."""
    from keras_rs_tpu.layers.embedding import native as native_lib
    from keras_rs_tpu.layers.embedding.device_preprocessing import (
        preprocess_stack_device,
    )

    fcs = _big_capacity_configs("mean")
    stacks = build_stacks(fcs, 1, stacking="auto")
    stack = stacks[0]
    inputs, weights = make_inputs()
    host, _ = preprocess_stack(stack, inputs, weights, backend="numpy")
    assert host.fwd_slots is not None

    dev, _ = jax.jit(
        lambda ins, ws: preprocess_stack_device(stack, ins, ws)
    )(
        {k: jnp.asarray(np.asarray(v)) for k, v in inputs.items()},
        {k: jnp.asarray(v) for k, v in weights.items()},
    )
    assert "fwd_slots" in dev
    np.testing.assert_array_equal(
        np.asarray(dev["fwd_slots"]), host.fwd_slots
    )
    np.testing.assert_array_equal(
        np.asarray(dev["fwd_gains"]), host.fwd_gains
    )

    if native_lib.available():
        nat, _ = preprocess_stack(stack, inputs, weights, backend="native")
        np.testing.assert_array_equal(nat.fwd_slots, host.fwd_slots)
        np.testing.assert_array_equal(nat.fwd_gains, host.fwd_gains)


def test_construction_fwd_gate_falls_back():
    """N > C disables the construction forward in every backend (drop
    semantics only exist in the sorted path)."""
    t = TableConfig(
        name="t", vocabulary_size=50, embedding_dim=8,
        combiner="sum", max_ids_per_partition=8,
        max_unique_ids_per_partition=16,
    )
    fcs = [FeatureConfig("f", t, (B, 3), (B, 8))]
    stacks = build_stacks(fcs, 1, stacking="auto")
    stack = stacks[0]
    assert not stack.construction_fwd
    rng = np.random.default_rng(0)
    inputs = {"f": rng.integers(0, 50, size=(B, 3))}
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        coo, _ = preprocess_stack(stack, inputs, None, backend="numpy")
    assert coo.fwd_slots is None and coo.fwd_gains is None


def test_fwd_row_gather_flag_matches_block_gather(monkeypatch):
    """FWD_ROW_GATHER=True (2-index row-only fetch) must produce the
    same activations as the default block-gather+slice fetch."""
    from keras_rs_tpu.layers.embedding import lookup as lookup_mod

    t = TableConfig(
        name="big", vocabulary_size=64, embedding_dim=128,
        optimizer="adagrad", combiner="sum",
        max_ids_per_partition=128, max_unique_ids_per_partition=128,
    )
    fcs = [FeatureConfig("f", t, (B, 3), (B, 128))]
    mesh, stacks, states, raw = _setup_d1(fcs)
    stack = stacks[0]
    if not stack.packed_state:
        pytest.skip("packed-state layout not selected for this stack")
    rng = np.random.default_rng(3)
    inputs = {"f": rng.integers(0, 64, size=(B, 3))}
    weights = {"f": rng.random((B, 3)).astype(np.float32)}
    coo, _ = preprocess_stack(stack, inputs, weights)
    coo_dev = put_coo(mesh, coo)

    def acts_of():
        return np.asarray(
            jax.jit(
                lambda s, c: stack_lookup(stack, mesh, AXIS, s, c)
            )(states[stack.name], coo_dev)
        )

    base = acts_of()
    monkeypatch.setattr(lookup_mod, "FWD_ROW_GATHER", True)
    flipped = acts_of()
    np.testing.assert_array_equal(base, flipped)
