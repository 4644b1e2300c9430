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


#: Upper bound on row width for the Pallas path. Hardware-validated at
#: 128 ONLY: a dim-256 (two-lane-tile) row slice makes the kernel fail
#: to compile on v5e (tpu_compile_helper crash; dim-128 compiles fine
#: in the same session) — so wider rows take the XLA fallback. Re-test
#: before raising. The separate VMEM budget for [BLOCK_ROWS, k, dim]
#: blocks is MAX_BLOCK_WIDTH.
MAX_PALLAS_DIM = 128
#: Total f32 lanes per block row allowed in VMEM ([BLOCK_ROWS, k*dim]
#: double-buffered: 512 lanes -> 2 x 4 MB of the ~16 MB budget).
MAX_BLOCK_WIDTH = 512


def pallas_supported(dim: int, dtype=jnp.float32) -> bool:
    """The row DMA needs lane-aligned rows that fit the VMEM budget.

    Sub-4-byte dtypes are EXCLUDED: bf16 VMEM is (16, 128)-tiled with
    two rows packed per sublane, and Mosaic cannot slice a single bf16
    row out of a tiled memref for the DMA (verified on hardware: the
    kernel fails to compile with a memref_slice error). dim-128 bf16
    tables instead live as f32-TYPED pair-packed words (ops/bitpack.py)
    and ride this kernel at full rate; other bf16 shapes fall back to
    XLA's scatter.
    """
    return (
        jax.default_backend() == "tpu"
        and dim % _LANE == 0
        and dim <= MAX_PALLAS_DIM
        and jnp.dtype(dtype).itemsize == 4
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
        use_pallas = pallas_supported(table.shape[1], table.dtype)
    if use_pallas:
        return scatter_rows(table, idx, rows, interpret=interpret)
    return table.at[idx].set(rows, unique_indices=True)


# --- multi-stream scatter: table + optimizer slots in ONE kernel --------
#
# The embedding backward scatters the SAME index list into the table and
# into each optimizer slot array. Run as separate kernels those scatters
# serialize (each descriptor-rate bound with HBM mostly idle); one kernel
# issuing the streams interleaved overlaps them — measured 1.64 ms for a
# table+slot pair vs 1.93 ms for two single-stream kernels at the
# 40960x128 bench shape (~15% off the scatter wall, the step's largest
# single cost).

#: Auto-path gate for the k-stream kernel. True = use it whenever the
#: streams fit the VMEM budget together (validated on live v5e by
#: tools/validate_multi_scatter.py: bit-exact at the bench shape and
#: ~10% faster than back-to-back single-stream kernels). False falls
#: back to per-stream single kernels; explicit `use_pallas=True` always
#: engages the k-stream kernel.
MULTI_STREAM_AUTO = True


def _make_multi_kernel(k: int):
    # Keep TOTAL outstanding DMAs at the single-stream kernel's proven
    # budget (_NSEM = 64): with k interleaved streams, k DMAs go out per
    # row, so allow _INFLIGHT_GROUPS // k groups in flight. (Measured:
    # doubling to 128 outstanding changes nothing — 64 already saturates
    # the scalar core's DMA issue rate.)
    inflight = max(1, _INFLIGHT_GROUPS // k)
    nsem = _UNROLL * inflight

    def kernel(idx_ref, *refs):
        # refs = rows_0..rows_{k-1}, table_0..table_{k-1},
        #        out_0..out_{k-1}, sems
        rows_refs = refs[:k]
        out_refs = refs[2 * k : 3 * k]
        sems = refs[3 * k]
        ngroups = BLOCK_ROWS // _UNROLL

        def dma(s, j):
            return pltpu.make_async_copy(
                rows_refs[s].at[j],
                out_refs[s].at[idx_ref[j]],
                sems.at[j % nsem, s],
            )

        def put(g):
            for u in range(_UNROLL):
                j = g * _UNROLL + u
                for s in range(k):
                    dma(s, j).start()

        def wait(g):
            for u in range(_UNROLL):
                j = g * _UNROLL + u
                for s in range(k):
                    dma(s, j).wait()

        for g in range(inflight):
            put(g)

        def body(g, _):
            wait(g)

            @pl.when(g + inflight < ngroups)
            def _():
                put(g + inflight)

            return 0

        jax.lax.fori_loop(0, ngroups, body, 0)

    return kernel, nsem


@functools.partial(
    jax.jit,
    static_argnames=("interpret",),
    donate_argnums=(0,),
)
def _scatter_rows_multi(tables, idx, rows_list, *, interpret=False):
    N = idx.shape[0]
    k = len(tables)
    dim = tables[0].shape[1]
    Np = _round_up(max(N, BLOCK_ROWS), BLOCK_ROWS)
    if Np != N:
        pad_idx = idx[N - 1]
        idx = jnp.concatenate([idx, jnp.broadcast_to(pad_idx, (Np - N,))])
        rows_list = [
            jnp.concatenate(
                [r, jnp.broadcast_to(r[N - 1], (Np - N, dim))]
            )
            for r in rows_list
        ]
    idx = idx.astype(jnp.int32)

    kernel, nsem = _make_multi_kernel(k)
    return pl.pallas_call(
        kernel,
        grid=(Np // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS,), lambda i: (i,), memory_space=pltpu.SMEM
            )
        ]
        + [
            pl.BlockSpec(
                (BLOCK_ROWS, dim),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(k)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(k)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(k)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tables
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem, k))],
        input_output_aliases={1 + k + s: s for s in range(k)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, *rows_list, *tables)


# --- block scatter: [k, dim] row groups, ONE DMA each -------------------
#
# The packed table+slot state is a 3-D [R, k, dim] array: row r's table
# row and its k-1 optimizer-slot rows live as the k consecutive rows of
# packed[r]. For dim % 128 == 0 an f32 array is one lane-tile column
# wide, so packed[r] is one contiguous (k*dim*4)-byte range in HBM: the
# update scatter needs ONE descriptor per logical row instead of one per
# stream, and the backward fetch of table+slots becomes a single axis-0
# block gather — which XLA executes at HBM BYTE speed (measured 0.076 ms
# for 40960 x [2,128] blocks vs 0.436 ms for two row gathers).
#
# The state MUST stay 3-D end to end: a reshape between the gather and
# the aliased pallas_call breaks XLA's buffer aliasing and silently
# inserts a full-table copy per step (measured 21 ms/step — see
# tools/validate_block_rmw.py history).


def _block_kernel(nvalid_ref, idx_ref, rows_ref, table_ref, out_ref,
                  sems):
    # nvalid_ref [1] SMEM: number of LEADING descriptors that must be
    # written. The caller guarantees positions >= n_valid are padding
    # whose target rows need no update (the dedup contract pads
    # unique_slots with sink entries carrying exactly-zero gradients),
    # so whole DMA groups past that point are skipped — the scatter is
    # descriptor-rate bound, and on deduplicating workloads (power-law
    # ids, flagship valence) the capacity tail is a large fraction of
    # the static descriptor count. A group straddling n_valid issues
    # all its DMAs (<= _UNROLL - 1 redundant sink writes, benign).
    del table_ref
    ngroups = BLOCK_ROWS // _UNROLL
    base = pl.program_id(0) * ngroups
    # Group g (global base + g) is live iff its first position is
    # < n_valid, i.e. base + g < ceil(n_valid / _UNROLL).
    live_groups = (nvalid_ref[0] + _UNROLL - 1) // _UNROLL - base

    def dma(j):
        return pltpu.make_async_copy(
            rows_ref.at[j],  # [k, dim]
            out_ref.at[idx_ref[j]],  # [k, dim] group of the 3-D table
            sems.at[j % _NSEM],
        )

    def put(g):
        for u in range(_UNROLL):
            dma(g * _UNROLL + u).start()

    def wait(g):
        for u in range(_UNROLL):
            dma(g * _UNROLL + u).wait()

    lg = jnp.clip(live_groups, 0, ngroups)

    for g in range(_INFLIGHT_GROUPS):
        @pl.when(g < lg)
        def _(g=g):
            put(g)

    def body(g, _):
        wait(g)

        @pl.when(g + _INFLIGHT_GROUPS < lg)
        def _():
            put(g + _INFLIGHT_GROUPS)

        return 0

    jax.lax.fori_loop(0, lg, body, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret",), donate_argnums=(0,)
)
def scatter_row_blocks(
    packed: jax.Array,  # [R, k, dim] (HBM, donated -> updated in place)
    idx: jax.Array,  # [N] int32 logical row ids, unique
    blocks: jax.Array,  # [N, k, dim] new (table row, slot rows...) groups
    n_valid: jax.Array | None = None,  # scalar i32: leading descriptors
    #   that must land; positions >= n_valid are padding whose target
    #   rows need no write (the dedup sink tail). None = write all.
    *,
    interpret: bool = False,
) -> jax.Array:
    """packed[idx[i]] = blocks[i] ([k, dim] groups), one DMA per i."""
    N, k, dim = blocks.shape
    R = packed.shape[0]
    if N == 0:
        return packed
    Np = _round_up(max(N, BLOCK_ROWS), BLOCK_ROWS)
    if Np != N:
        pad_idx = idx[N - 1]
        idx = jnp.concatenate([idx, jnp.broadcast_to(pad_idx, (Np - N,))])
        blocks = jnp.concatenate(
            [blocks, jnp.broadcast_to(blocks[N - 1], (Np - N, k, dim))]
        )
    idx = idx.astype(jnp.int32)
    if n_valid is None:
        nv = jnp.full((1,), N, jnp.int32)
    else:
        nv = jnp.clip(
            jnp.asarray(n_valid, jnp.int32), 0, N
        ).reshape(1)

    return pl.pallas_call(
        _block_kernel,
        grid=(Np // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec(
                (1,), lambda i: (0,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (BLOCK_ROWS,), lambda i: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, k, dim),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R, k, dim), packed.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_NSEM,))],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(nv, idx, blocks, packed)


# --- fused optimizer-apply + block scatter -------------------------------
#
# The round-5 flagship profile showed the packed backward paying ~14 ms
# of elementwise optimizer fusions PLUS two layout-change copies PLUS a
# full HBM round-trip of the updated blocks (write new_blk, re-read it
# as the scatter kernel's input). Folding the optimizer math INTO the
# scatter kernel removes the round-trip and the relayouts: the kernel
# reads the gathered (table,slot) blocks and the row gradients through
# the normal VMEM pipeline, computes the updated blocks in VMEM, and
# DMAs them straight into the table. The per-optimizer math is TRACED
# into the kernel (plain jnp on the loaded tiles); traced scalars the
# math needs (the step counter for Adam bias correction / lr schedules)
# arrive through a small SMEM vector.


#: Tile for the fused apply+scatter kernel: smaller than BLOCK_ROWS —
#: the kernel holds the gathered blocks, the gradients, the updated-
#: block scratch AND the traced optimizer math's temporaries in VMEM at
#: once (a 2048-row tile exceeded the 16 MB scoped-vmem limit by 1.26 MB
#: at flagship scale — /tmp/chip_r5/profile_flagship.log, first run).
RMW_BLOCK_ROWS = 1024


#: Chunks the fused kernel's per-tile optimizer compute so it OVERLAPS
#: the previous chunk's in-flight DMAs (the serial compute-then-drain
#: form measured ~6.5 ms/step of exposed VPU time at flagship scale:
#: 33.7 ms fused vs the 27.2 ms pure-DMA scatter). 1 = serial fallback.
RMW_OVERLAP_CHUNKS = 4


def _make_rmw_kernel(apply_fn, k: int, nscalars: int):
    nchunks = RMW_OVERLAP_CHUNKS
    assert RMW_BLOCK_ROWS % (nchunks * _UNROLL) == 0

    def kernel(nvalid_ref, scalars_ref, idx_ref, blk_ref, grad_ref,
               table_ref, out_ref, newblk_ref, sems):
        del table_ref
        ngroups = RMW_BLOCK_ROWS // _UNROLL
        gpc = ngroups // nchunks  # groups per compute chunk
        rows_pc = RMW_BLOCK_ROWS // nchunks
        base = pl.program_id(0) * ngroups
        live_groups = (
            (nvalid_ref[0] + _UNROLL - 1) // _UNROLL - base
        )
        lg = jnp.clip(live_groups, 0, ngroups)
        scalars = [scalars_ref[i] for i in range(nscalars)]

        def compute_chunk(c):
            lo = c * rows_pc
            new_parts = apply_fn(
                blk_ref[lo : lo + rows_pc],
                grad_ref[lo : lo + rows_pc],
                scalars,
            )
            assert len(new_parts) == k, (len(new_parts), k)
            for s, part in enumerate(new_parts):
                newblk_ref[lo : lo + rows_pc, s, :] = part

        def dma(j):
            return pltpu.make_async_copy(
                newblk_ref.at[j],
                out_ref.at[idx_ref[j]],
                sems.at[j % _NSEM],
            )

        def put(g):
            for u in range(_UNROLL):
                dma(g * _UNROLL + u).start()

        def wait(g):
            for u in range(_UNROLL):
                dma(g * _UNROLL + u).wait()

        # Software pipeline: compute chunk c, then walk its groups with
        # the rolling in-flight window (wait g - _INFLIGHT_GROUPS, put
        # g) — so chunk c+1's VPU compute runs while chunk c's DMAs are
        # still in flight. Groups past lg are skipped (dedup sink
        # tail); every wait pairs with an issued put because both sides
        # predicate on the same index.
        def walk(g, _):
            @pl.when(
                jnp.logical_and(
                    g >= _INFLIGHT_GROUPS, g - _INFLIGHT_GROUPS < lg
                )
            )
            def _():
                wait(g - _INFLIGHT_GROUPS)

            @pl.when(g < lg)
            def _():
                put(g)

            return 0

        for c in range(nchunks):
            compute_chunk(c)
            jax.lax.fori_loop(c * gpc, (c + 1) * gpc, walk, 0)

        def drain(g, _):
            @pl.when(g < lg)
            def _():
                wait(g)

            return 0

        jax.lax.fori_loop(
            ngroups - _INFLIGHT_GROUPS, ngroups, drain, 0
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "interpret"),
    donate_argnums=(0,),
)
def apply_scatter_row_blocks(
    packed: jax.Array,  # [R, k, dim] (HBM, donated -> updated in place)
    idx: jax.Array,  # [N] int32 logical row ids, unique
    blk: jax.Array,  # [N, k, dim] CURRENT (table row, slot rows) groups
    grads: jax.Array,  # [N, dim] summed row gradients
    scalars: jax.Array,  # [nscalars] f32 (step counter etc.)
    apply_fn,  # ([T,k,dim], [T,dim], [scalars]) -> list of k [T,dim]
    n_valid: jax.Array | None = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """packed[idx[i]] = apply_fn(blk, grads)[i], one DMA per live i.

    `apply_fn` must be a Python callable (hashable; passed statically)
    of pure jnp math — it is traced INTO the kernel and runs on the
    VMEM tiles.
    """
    N, k, dim = blk.shape
    R = packed.shape[0]
    if N == 0:
        return packed
    T = RMW_BLOCK_ROWS
    Np = _round_up(max(N, T), T)
    if Np != N:
        pad_idx = idx[N - 1]
        idx = jnp.concatenate([idx, jnp.broadcast_to(pad_idx, (Np - N,))])
        blk = jnp.concatenate(
            [blk, jnp.broadcast_to(blk[N - 1], (Np - N, k, dim))]
        )
        grads = jnp.concatenate(
            [grads, jnp.broadcast_to(grads[N - 1], (Np - N, dim))]
        )
    idx = idx.astype(jnp.int32)
    if n_valid is None:
        nv = jnp.full((1,), N, jnp.int32)
    else:
        nv = jnp.clip(
            jnp.asarray(n_valid, jnp.int32), 0, N
        ).reshape(1)
    scalars = jnp.asarray(scalars, jnp.float32).reshape(-1)

    kernel = _make_rmw_kernel(apply_fn, k, scalars.shape[0])
    return pl.pallas_call(
        kernel,
        grid=(Np // T,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (scalars.shape[0],),
                lambda i: (0,),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (T,), lambda i: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (T, k, dim),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (T, dim),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R, k, dim), packed.dtype),
        scratch_shapes=[
            pltpu.VMEM((T, k, dim), packed.dtype),
            pltpu.SemaphoreType.DMA((_NSEM,)),
        ],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(nv, scalars, idx, blk, grads, packed)


def scatter_row_blocks_unique(
    packed: jax.Array,  # [R, k, dim]
    idx: jax.Array,
    blocks: jax.Array,
    n_valid: jax.Array | None = None,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Backend-selecting k-row block scatter (Pallas on TPU, XLA else).

    `n_valid` (optional scalar): only the first n_valid descriptors
    must be written; the tail is dedup sink padding whose target rows
    are unchanged. The Pallas kernel skips those DMA groups (the
    scatter is descriptor-bound, so on deduplicating workloads this is
    a proportional win); the XLA fallback ignores the hint (its scatter
    applies all updates — the tail writes are value-identical no-ops
    for the zero-gradient contract, so the result matches).
    """
    blocks = blocks.astype(packed.dtype)
    k, dim = blocks.shape[1], blocks.shape[2]
    if use_pallas is None:
        # Row width must be DMA-sliceable AND the [BLOCK_ROWS, k, dim]
        # VMEM block must fit the budget.
        use_pallas = (
            pallas_supported(dim, packed.dtype)
            and k * dim <= MAX_BLOCK_WIDTH
        )
    if use_pallas:
        return scatter_row_blocks(
            packed, idx, blocks, n_valid, interpret=interpret
        )
    return packed.at[idx].set(blocks, unique_indices=True)


def scatter_rows_unique_multi(
    tables: list[jax.Array],
    idx: jax.Array,
    rows_list: list[jax.Array],
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> list[jax.Array]:
    """`tables[s][idx[i]] = rows_list[s][i]` for every stream s, in one
    pipelined kernel (interleaved DMA streams). All arrays must share
    the same row count AND the same `dim`; `idx` must be unique (the
    same contract as `scatter_rows_unique`)."""
    if len(tables) != len(rows_list) or not tables:
        raise ValueError("tables and rows_list must pair up (non-empty)")
    dim = tables[0].shape[1]
    if any(t.shape[1] != dim for t in tables) or any(
        r.shape[1] != dim for r in rows_list
    ):
        raise ValueError("all streams must share the row width")
    rows_list = [
        r.astype(t.dtype) for t, r in zip(tables, rows_list)
    ]
    multi_ok = use_pallas
    if multi_ok is None:
        # Every stream's rows must be DMA-sliceable (width + dtype; a
        # bf16 stream forces its own XLA fallback) and the per-stream
        # VMEM blocks must fit the budget together.
        multi_ok = (
            MULTI_STREAM_AUTO
            and all(pallas_supported(dim, t.dtype) for t in tables)
            and dim * len(tables) <= MAX_BLOCK_WIDTH
        )
    if len(tables) == 1 or not multi_ok:
        # Per-stream scatters; each re-decides Pallas-vs-XLA on its own
        # width when the caller didn't force a backend (so e.g. dim-512
        # streams that don't fit the multi budget together still get the
        # single-stream Pallas kernel each).
        return [
            scatter_rows_unique(
                t, idx, r, use_pallas=use_pallas, interpret=interpret
            )
            for t, r in zip(tables, rows_list)
        ]
    if idx.shape[0] == 0:
        return list(tables)
    return list(
        _scatter_rows_multi(
            tuple(tables), idx, tuple(rows_list), interpret=interpret
        )
    )
