"""Pallas row-scatter kernel for sharded embedding table updates.

Honest microbenchmarks at the production shape (40960 x 128 f32 rows
into a 6M-row table, v5e, scan-chained + host-read timing):

    XLA row gather (sorted OR unsorted) 0.24 ms  ( 87 GB/s, 170M rows/s)
    XLA row scatter (.at[].set)         2.9 ms   (  7 GB/s)  <- the wall
    XLA scatter w/ sorted+unique hints  9.4 ms   (slower!)
    Pallas scatter, 1 DMA/row           2.0 ms   ( 10 GB/s)
    Pallas scatter, 8-unrolled groups   1.0 ms   ( 20 GB/s)  <- this kernel

Row access is DESCRIPTOR-rate bound, not byte bound: gathers of
contiguous-index rows run no faster, and NARROWER rows are slower
(f32 dim=64: 112M rows/s; bf16 dim=128: 120M rows/s) — so bf16 tables
buy HBM capacity, not scattered-access speed. (An earlier claim here
that sorted gathers hit 729 GB/s was a harness artifact — see
BASELINE.md "honest timing protocol" on loop-invariant hoisting.)

Conclusions baked into the lookup path (layers/embedding/lookup.py):
  * GATHERS use `jnp.take` — XLA's row gather sustains ~170M rows/s at
    dim 128, 4x the rate of per-row Pallas DMA (~40M descriptors/s),
    so a Pallas gather loses. `indices_are_sorted=True` is passed where
    true (it is free and skips the bounds-sort), but measures the same.
  * SCATTER uses this kernel: rows stream VMEM->HBM with 64 outstanding
    DMAs issued in unrolled groups of 8. Indices must be UNIQUE (the
    dedup stage guarantees it; the sink-row padding entries all target
    the sink row with identical bytes, so their write races are benign).
    `input_output_aliases` pins the update in place — the table is never
    copied.

Parity context: this is the row-update inner loop of the SparseCore grad
kernel the reference delegates to jax-tpu-embedding
(`tpu_sparse_dense_matmul_grad`, keras_rs/src/layers/embedding/jax/
embedding_lookup.py:225).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keras_rs_tpu.utils.shape_utils import round_up as _round_up

BLOCK_ROWS = 2048  # rows per grid program (int32 SMEM tiling wants >=1024)
_UNROLL = 8  # DMAs issued back-to-back per group
_INFLIGHT_GROUPS = 8  # groups in flight (64 outstanding DMAs)
_NSEM = _UNROLL * _INFLIGHT_GROUPS
_LANE = 128



def _scatter_kernel(idx_ref, rows_ref, table_ref, out_ref, sems):
    # out_ref aliases table_ref's buffer (input_output_aliases); rows are
    # DMA'd straight into it. Unique indices => order irrelevant.
    del table_ref
    ngroups = BLOCK_ROWS // _UNROLL

    def dma(j):
        return pltpu.make_async_copy(
            rows_ref.at[j], out_ref.at[idx_ref[j]], sems.at[j % _NSEM]
        )

    def put(g):
        for u in range(_UNROLL):
            dma(g * _UNROLL + u).start()

    def wait(g):
        for u in range(_UNROLL):
            dma(g * _UNROLL + u).wait()

    for g in range(_INFLIGHT_GROUPS):
        put(g)

    def body(g, _):
        wait(g)

        @pl.when(g + _INFLIGHT_GROUPS < ngroups)
        def _():
            put(g + _INFLIGHT_GROUPS)

        return 0

    jax.lax.fori_loop(0, ngroups, body, 0)


#: Upper bound on row width for the Pallas path: the VMEM rows block is
#: [BLOCK_ROWS, dim] f32, double-buffered by the pipeline — keep it well
#: under the ~16 MB budget (dim 512 -> 2 x 4 MB).
MAX_PALLAS_DIM = 512


def pallas_supported(dim: int) -> bool:
    """The row DMA needs lane-aligned rows that fit the VMEM budget."""
    return (
        jax.default_backend() == "tpu"
        and dim % _LANE == 0
        and dim <= MAX_PALLAS_DIM
    )


@functools.partial(
    jax.jit, static_argnames=("interpret",), donate_argnums=(0,)
)
def scatter_rows(
    table: jax.Array,  # [R, dim] (HBM, donated -> updated in place)
    idx: jax.Array,  # [N] int32, unique (duplicates: benign only if
    #                  the duplicate rows carry identical bytes)
    rows: jax.Array,  # [N, dim] (cast to table dtype by the caller)
    *,
    interpret: bool = False,
) -> jax.Array:
    """table[idx[i]] = rows[i] in place via pipelined row DMA."""
    N = idx.shape[0]
    R, dim = table.shape
    if N == 0:
        return table
    Np = _round_up(max(N, BLOCK_ROWS), BLOCK_ROWS)
    if Np != N:
        # Park padding on the last real entry (identical bytes => the
        # duplicate-write race is benign).
        pad_idx = idx[N - 1]
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(pad_idx, (Np - N,))]
        )
        rows = jnp.concatenate(
            [rows, jnp.broadcast_to(rows[N - 1], (Np - N, dim))]
        )
    idx = idx.astype(jnp.int32)

    return pl.pallas_call(
        _scatter_kernel,
        grid=(Np // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS,), lambda i: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, dim),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R, dim), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_NSEM,))],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, rows, table)


def scatter_rows_unique(
    table: jax.Array,
    idx: jax.Array,
    rows: jax.Array,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Backend-selecting unique-row scatter (Pallas on TPU, XLA else)."""
    rows = rows.astype(table.dtype)
    if use_pallas is None:
        use_pallas = pallas_supported(table.shape[1])
    if use_pallas:
        return scatter_rows(table, idx, rows, interpret=interpret)
    return table.at[idx].set(rows, unique_indices=True)
