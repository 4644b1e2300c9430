"""bfloat16 embedding tables with stochastic-rounded updates."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.distributed_embedding import (
    DistributedEmbedding,
)
from keras_rs_tpu.layers.embedding.lookup import (
    split_activations,
    stack_lookup,
)
from keras_rs_tpu.ops.quant import stochastic_round_bf16
from keras_rs_tpu.parallel import mesh as mesh_lib

B = 16


def test_stochastic_round_is_unbiased():
    # A value exactly between two bf16 ulps (ulp at 1.0 = 2^-7, 7-bit
    # mantissa) rounds up ~half the time.
    mid = 1.0 + 2.0 ** -8
    x = jnp.full((20000,), mid)
    out = stochastic_round_bf16(x, jax.random.key(0)).astype(jnp.float32)
    up = float(jnp.mean((out > mid).astype(jnp.float32)))
    assert 0.45 < up < 0.55, up
    # Mean preserved to within noise.
    np.testing.assert_allclose(float(out.mean()), mid, rtol=1e-4)
    # A quarter-ulp value rounds up ~25% of the time.
    q = 1.0 + 2.0 ** -9
    out_q = stochastic_round_bf16(
        jnp.full((20000,), q), jax.random.key(1)
    ).astype(jnp.float32)
    up_q = float(jnp.mean((out_q > q).astype(jnp.float32)))
    assert 0.20 < up_q < 0.30, up_q


def test_stochastic_round_exact_values_pass_through():
    x = jnp.asarray([1.0, -2.0, 0.0, 0.5], jnp.float32)
    out = stochastic_round_bf16(x, jax.random.key(1))
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)), np.asarray(x)
    )


def make_bf16_layer():
    t = TableConfig(
        "t", 64, 8, optimizer="sgd", combiner="sum",
        placement="sharded", dtype="bfloat16",
        max_ids_per_partition=16, max_unique_ids_per_partition=16,
    )
    fc = FeatureConfig("f", t, (B,), (B, 8))
    return DistributedEmbedding([fc], key=jax.random.key(0))


def test_bf16_table_storage_and_f32_activations():
    layer = make_bf16_layer()
    for stack in layer.stacks:
        assert layer.state.value[stack.name]["table"].dtype == jnp.bfloat16
    inputs = {"f": np.arange(B) % 64}
    pre = layer.preprocess(inputs)
    acts = jax.jit(lambda l, p: l(p))(layer, pre)
    assert acts[0].dtype == jnp.float32


def test_bf16_training_accumulates_small_updates():
    """With lr*grad far below a bf16 ulp, stochastic rounding still learns
    in expectation while round-to-nearest would freeze the table."""
    layer = make_bf16_layer()
    stack = layer.stacks[0]
    # Set the row to 1.0 (bf16 ulp at 1.0 is 2^-8 = 0.0039).
    layer.set_embedding_tables({"t": np.ones((64, 8), np.float32)})
    inputs = {"f": np.zeros(B, np.int64)}  # all hit row 0
    pre = layer.preprocess(inputs)

    # Pick the cotangent so the sgd (lr=0.01) update is ~1/4 bf16 ulp per
    # step: well below round-to-nearest resolution.
    ulp = 2.0 ** -7
    cot = ulp / 4.0 / (0.01 * B)

    def loss(state):
        acts = stack_lookup(
            stack, layer.mesh, layer.axis_name, state,
            pre["sharded"][stack.name],
        )
        feats = split_activations(stack, acts)
        return jnp.sum(feats["f"]) * cot

    grad_fn = jax.jit(jax.grad(loss))
    state = dict(layer.state.value[stack.name])
    for _ in range(40):
        # block each step: queueing many small collective programs on
        # the 1-core 8-device CPU backend can exhaust the execution
        # thread pool mid-rendezvous and hit XLA's hardcoded 40 s abort
        # (see CLAUDE.md).
        state = jax.block_until_ready(grad_fn(state))
    table = np.asarray(state["table"].astype(jnp.float32))
    # Expected drift: 40 steps * 0.25 ulp (sgd lr=0.01: update = lr*grad...)
    # With sgd lr 0.01 the per-step delta is 0.01 * B * cot = 0.01*ulp/4.
    # Too small to assert drift magnitude; assert it MOVED at all, which
    # round-to-nearest could never do.
    moved = np.abs(table[0] - 1.0).max()
    assert moved > 0.0, "stochastic rounding never moved the row"


# --- bit-packed uint32 layout (dim-128 bf16 stacks, ops/bitpack.py) ------


def make_bf16_128_layer(optimizer="adagrad"):
    t = TableConfig(
        "t", 200, 128, optimizer=optimizer, combiner="sum",
        placement="sharded", dtype="bfloat16",
        max_ids_per_partition=32, max_unique_ids_per_partition=32,
    )
    fc = FeatureConfig("f", t, (B, 2), (B, 128))
    return DistributedEmbedding([fc], key=jax.random.key(0))


def test_bitpacked_layout_engaged_and_roundtrips():
    """dim-128 bf16 stacks store ONE uint32 [R/2, dim] array; the sink
    row gets a dead pair partner; logical table export round-trips."""
    layer = make_bf16_128_layer()
    stack = layer.stacks[0]
    assert stack.bitpacked_state and not stack.packed_state
    assert stack.rows_per_shard % 2 == 0
    st = layer.state.value[stack.name]
    # Packed words are f32-TYPED (pure bitcast; autodiff/checkpoint
    # compatibility — ops/bitpack.py).
    assert st["table"].dtype == jnp.float32
    assert st["table"].shape == (stack.global_rows // 2, 128)
    # Slots stay f32 at the LOGICAL row count.
    assert st["slots"]["accumulator"].shape == (
        stack.global_rows, 128
    )

    rng = np.random.default_rng(0)
    vals = rng.normal(size=(200, 128)).astype(np.float32)
    # bf16 storage: set/get round-trips through the bf16 cast.
    layer.set_embedding_tables({"t": vals})
    got = layer.get_embedding_tables()["t"]
    np.testing.assert_array_equal(
        got.astype(jnp.bfloat16), vals.astype(jnp.bfloat16)
    )

    # Forward activations come from the packed words.
    inputs = {"f": rng.integers(0, 200, size=(B, 2))}
    pre = layer.preprocess(inputs)
    acts = jax.jit(lambda l, p: l(p))(layer, pre)
    want = (
        vals.astype(jnp.bfloat16).astype(np.float32)[
            np.asarray(inputs["f"])
        ].sum(axis=1)
    )
    np.testing.assert_allclose(
        np.asarray(acts[0]), want, rtol=1e-6, atol=1e-6
    )


def test_bitpacked_matches_split_layout_bit_exactly():
    """Training through the bit-packed layout equals the plain-bf16
    split layout BIT FOR BIT: the stochastic-rounding key depends only
    on (step, shard), so identical f32 updates round identically."""
    import dataclasses

    from keras_rs_tpu.layers.embedding.lookup import (
        init_stack_state,
        stack_lookup,
    )
    from keras_rs_tpu.layers.embedding.preprocessing import (
        preprocess_stack,
    )
    from keras_rs_tpu.layers.embedding.stacking import build_stacks
    from keras_rs_tpu.ops import bitpack

    D = 8
    t = TableConfig(
        "t", 200, 128, optimizer="adagrad", combiner="sum",
        dtype="bfloat16",
        max_ids_per_partition=32, max_unique_ids_per_partition=32,
    )
    fcs = [FeatureConfig("f", t, (B, 2), (B, 128))]
    mesh = mesh_lib.create_mesh()
    stack = build_stacks(fcs, D, stacking="auto")[0]
    assert stack.bitpacked_state
    # Same geometry (rows_per_shard, sink), only the layout flag differs.
    stack_split = dataclasses.replace(stack, bitpacked_state=False)

    rng = np.random.default_rng(3)
    table_f32 = rng.normal(size=(stack.global_rows, 128)).astype(
        np.float32
    )
    tbl = jax.device_put(
        jnp.asarray(table_f32, jnp.bfloat16),
        mesh_lib.table_sharding(mesh),
    )
    state_bp = init_stack_state(stack, tbl)
    state_sp = init_stack_state(stack_split, tbl)
    assert state_bp["table"].shape == (stack.global_rows // 2, 128)
    assert state_sp["table"].dtype == jnp.bfloat16

    inputs = {"f": rng.integers(0, 200, size=(B, 2))}
    coo, _ = preprocess_stack(stack, inputs)
    sharding = mesh_lib.batch_sharding(mesh)
    coo_dev = {
        k: jax.device_put(v, sharding) for k, v in coo.arrays().items()
    }

    def train2(stk, state):
        def loss(st):
            acts = stack_lookup(stk, mesh, "data", st, coo_dev)
            return jnp.sum(acts.astype(jnp.float32) ** 2) * 1e-3

        for _ in range(2):
            g = jax.jit(jax.grad(loss))(dict(state))
            state = g  # Overwrite contract: cotangent IS the new state
        return state

    out_bp = train2(stack, state_bp)
    out_sp = train2(stack_split, state_sp)
    got = np.asarray(
        bitpack.unpack_rows(out_bp["table"])
    ).view(np.uint16)
    want = np.asarray(out_sp["table"]).view(np.uint16)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(out_bp["slots"]["accumulator"]),
        np.asarray(out_sp["slots"]["accumulator"]),
    )
    np.testing.assert_allclose(float(out_bp["step"]), 2.0)


def test_bitpacked_adam_full_slots_bit_exact_vs_split():
    """Two full [R, dim] f32 slots (Adam) next to the bitpacked word
    table: the slot multi-scatter and the word scatter use DIFFERENT
    index lists (rows vs pairs); results must still equal the split
    layout bit for bit."""
    import dataclasses

    from keras_rs_tpu.layers.embedding.lookup import (
        init_stack_state,
        stack_lookup,
    )
    from keras_rs_tpu.layers.embedding.preprocessing import (
        preprocess_stack,
    )
    from keras_rs_tpu.layers.embedding.stacking import build_stacks
    from keras_rs_tpu.ops import bitpack

    D = 8
    t = TableConfig(
        "t", 120, 128, optimizer="adam", combiner="sum",
        dtype="bfloat16",
        max_ids_per_partition=32, max_unique_ids_per_partition=32,
    )
    fcs = [FeatureConfig("f", t, (B, 2), (B, 128))]
    mesh = mesh_lib.create_mesh()
    stack = build_stacks(fcs, D, stacking="auto")[0]
    assert stack.bitpacked_state
    stack_split = dataclasses.replace(stack, bitpacked_state=False)

    rng = np.random.default_rng(7)
    tbl = jax.device_put(
        jnp.asarray(
            rng.normal(size=(stack.global_rows, 128)), jnp.bfloat16
        ),
        mesh_lib.table_sharding(mesh),
    )
    state_bp = init_stack_state(stack, tbl)
    state_sp = init_stack_state(stack_split, tbl)
    assert set(state_bp["slots"]) == {"momentum", "velocity"}

    inputs = {"f": rng.integers(0, 120, size=(B, 2))}
    coo, _ = preprocess_stack(stack, inputs)
    sharding = mesh_lib.batch_sharding(mesh)
    coo_dev = {
        k: jax.device_put(v, sharding) for k, v in coo.arrays().items()
    }

    def train2(stk, state):
        def loss(st):
            acts = stack_lookup(stk, mesh, "data", st, coo_dev)
            return jnp.sum(acts.astype(jnp.float32) ** 2) * 1e-3

        for _ in range(2):
            state = jax.jit(jax.grad(loss))(dict(state))
        return state

    out_bp = train2(stack, state_bp)
    out_sp = train2(stack_split, state_sp)
    np.testing.assert_array_equal(
        np.asarray(bitpack.unpack_rows(out_bp["table"])).view(np.uint16),
        np.asarray(out_sp["table"]).view(np.uint16),
    )
    for k in ("momentum", "velocity"):
        np.testing.assert_array_equal(
            np.asarray(out_bp["slots"][k]),
            np.asarray(out_sp["slots"][k]),
        )
