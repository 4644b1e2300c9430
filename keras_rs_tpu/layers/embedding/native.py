"""ctypes bindings for the native (C++) COO preprocessing engine.

Loads native/libcoo_preprocess.so, building it with g++ on first use if
missing. `preprocess_stack_native` is a drop-in replacement for the numpy
path in preprocessing.py (bit-for-bit parity asserted in
tests/test_native_preprocess.py); `preprocess_stack(...,
backend="auto")` prefers it when available.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Mapping

import numpy as np

from keras_rs_tpu.utils.native_build import load_shared_lib

from keras_rs_tpu.layers.embedding.preprocessing import (
    CooBatch,
    InputStats,
)
from keras_rs_tpu.layers.embedding.stacking import TableStack

_SOURCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    ))),
    "native",
    "coo_preprocess.cc",
)
_LIB_PATH = os.path.join(os.path.dirname(_SOURCE), "libcoo_preprocess.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_COMBINER_CODES = {"sum": 0, "mean": 1, "sqrtn": 2}


def get_lib() -> ctypes.CDLL | None:
    """Loads (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib = load_shared_lib(_SOURCE, _LIB_PATH)
        if lib is None:
            return None
        lib.coo_preprocess.restype = ctypes.c_int
        _lib = lib
        # At flagship valence the per-batch output buffers are >5 MB
        # each: without the mallopt tuning every np.full below is a
        # fresh mmap whose page-fault storm runs at 0.02-0.1 GB/s on
        # this class of VM (same pathology as the file loader's column
        # arrays — data/native_io.py). Idempotent, KRT_MALLOC_TUNING=0
        # opts out.
        from keras_rs_tpu.data.native_io import (
            tune_malloc_for_large_columns,
        )

        tune_malloc_for_large_columns()
        return _lib


def available() -> bool:
    return get_lib() is not None


def preprocess_stack_native(
    stack: TableStack,
    inputs: Mapping[str, np.ndarray],
    weights: Mapping[str, np.ndarray] | None = None,
) -> tuple[CooBatch, InputStats]:
    """Native-equivalent of preprocessing.preprocess_stack."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"

    D = stack.num_shards
    C = stack.max_ids_per_partition
    U = stack.max_unique_ids_per_shard
    F = stack.num_features
    B = stack.batch_size
    S_l = F * (B // D)
    sink = stack.sink_slot

    id_arrays = []
    w_arrays = []
    valences = np.zeros(F, np.int64)
    vocabs = np.zeros(F, np.int64)
    offsets = np.zeros(F, np.int64)
    rotations = np.zeros(F, np.int64)
    combiners = np.zeros(F, np.int32)
    id_ptrs = (ctypes.POINTER(ctypes.c_int64) * F)()
    w_ptrs = (ctypes.POINTER(ctypes.c_float) * F)()
    for i, fspec in enumerate(stack.features):
        ids = np.ascontiguousarray(
            np.asarray(inputs[fspec.name]), np.int64
        )
        if ids.ndim == 1:
            ids = ids[:, None]
        if ids.shape[0] != B:
            raise ValueError(
                f"Feature {fspec.name}: expected batch {B}, got "
                f"{ids.shape[0]}."
            )
        w = None if weights is None else weights.get(fspec.name)
        if w is not None:
            w = np.ascontiguousarray(np.asarray(w), np.float32)
            if w.ndim == 1:
                w = w[:, None]
            if w.shape != ids.shape:
                raise ValueError(
                    f"Feature {fspec.name}: weights shape {w.shape} != "
                    f"ids shape {ids.shape}."
                )
        tspec = stack.table_spec(fspec.table_name)
        id_arrays.append(ids)
        w_arrays.append(w)
        valences[i] = ids.shape[1]
        vocabs[i] = tspec.vocabulary_size
        offsets[i] = tspec.local_offset
        rotations[i] = tspec.rotation
        combiners[i] = _COMBINER_CODES[tspec.combiner]
        id_ptrs[i] = ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        w_ptrs[i] = (
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if w is not None
            else ctypes.POINTER(ctypes.c_float)()
        )

    send_slots = np.full((D, D, C), sink, np.int32)
    send_segs = np.zeros((D, D, C), np.int32)
    send_gains = np.zeros((D, D, C), np.float32)
    unique_slots = np.full((D, U), sink, np.int32)
    entry_unique = np.full((D, D * C), U, np.int32)  # U = drop sentinel
    divisors = np.ones((D, S_l), np.float32)
    stats = np.zeros(3, np.int64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.coo_preprocess(
        ctypes.c_int64(F),
        id_ptrs,
        w_ptrs,
        ptr(valences, ctypes.c_int64),
        ptr(vocabs, ctypes.c_int64),
        ptr(offsets, ctypes.c_int64),
        ptr(rotations, ctypes.c_int64),
        ptr(combiners, ctypes.c_int32),
        ctypes.c_int64(B),
        ctypes.c_int64(D),
        ctypes.c_int64(C),
        ctypes.c_int64(U),
        ctypes.c_int64(sink),
        ptr(send_slots, ctypes.c_int32),
        ptr(send_segs, ctypes.c_int32),
        ptr(send_gains, ctypes.c_float),
        ptr(unique_slots, ctypes.c_int32),
        ptr(entry_unique, ctypes.c_int32),
        ptr(divisors, ctypes.c_float),
        ptr(stats, ctypes.c_int64),
    )
    if rc != 0:
        raise RuntimeError(f"coo_preprocess failed with code {rc}")

    # Fold the combiner divisor into the gains — the IDENTICAL
    # elementwise expression as preprocessing.py applies, on the C++
    # engine's bit-identical raw gains/divisors, so cross-backend bit
    # parity is preserved while the device kernel skips all divisions.
    send_gains = send_gains / divisors[
        np.arange(D, dtype=np.int64)[:, None, None], send_segs
    ]
    # Globalize segment ids (src_device * S_l + seg) — preprocessing.py
    # parity; the lookup consumes these as flat segment-sum offsets.
    send_segs = send_segs + (
        np.arange(D, dtype=np.int32)[:, None, None] * S_l
    )

    return (
        CooBatch(
            send_slots=send_slots,
            send_segs=send_segs,
            send_gains=send_gains,
            unique_slots=unique_slots,
            entry_unique=entry_unique,
            divisors=divisors,
        ),
        InputStats(
            max_ids_per_bucket=int(stats[0]),
            max_unique_per_shard=int(stats[1]),
            dropped_ids=int(stats[2]),
        ),
    )
