"""Corruption-safety fuzz for the native TFRecord parser.

The C++ reader (native/tfrecord_reader.cc) consumes untrusted bytes —
real datasets arrive over networks and disks that truncate and corrupt.
The reference inherits tf.data's hardened C++ kernels for this
(examples/ml_perf/dataloader.py:135-200); our engine must hold the same
line: NO input may crash, hang, or overrun the process. Every mutation
below must either parse (possibly to fewer records) or raise OSError —
in bounded time.

Regression anchor: a corrupted 8-byte record-length near 2^64 used to
overflow the `pos + len + 4 > N` framing check, driving `pos`
backwards — an unbounded loop on hostile input (fixed with the
subtraction-form bounds check in parse_core / tfrec_parse_file_cols).
"""

from __future__ import annotations

import os
import signal

import numpy as np
import pytest

from keras_rs_tpu.data import native_io, tfrecord

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native reader unavailable"
)

KEYS = ["feat_f", "feat_i", "feat_b"]


def _write_valid(path: str, n: int = 8) -> bytes:
    recs = []
    for r in range(n):
        recs.append(
            tfrecord.make_example(
                {
                    "feat_f": np.arange(4, dtype=np.float32) + r,
                    "feat_i": np.arange(3, dtype=np.int64) + r,
                    "feat_b": bytes([r % 256] * 6),
                }
            )
        )
    tfrecord.write_tfrecord(path, recs)
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture
def alarm():
    """Hard wall-clock bound: a hang is a failure, not a timeout."""

    def _raise(signum, frame):  # pragma: no cover - only on regression
        raise AssertionError("native parse did not terminate (hang)")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(120)
    yield
    signal.alarm(0)
    signal.signal(signal.SIGALRM, old)


def _parse_all_entry_points(path: str) -> None:
    """Drives every native entry point; OSError is an accepted outcome."""
    try:
        rows = native_io.parse_file_columns(path, KEYS)
        for row in rows:
            for v in row.values():
                np.asarray(v[0] if isinstance(v, list) else v)
    except OSError:
        pass
    try:
        native_io.parse_file_batched(path, KEYS, copy_bytes=True)
    except OSError:
        pass
    try:
        native_io.parse_file_fixed(
            path,
            KEYS,
            schema=[(1, 16), (2, 24), (0, 6)],
            n_cap=32,
        )
    except OSError:
        pass


def test_huge_length_field_terminates(tmp_path, alarm):
    # A 2^64-scale record length must not wrap the framing arithmetic.
    path = str(tmp_path / "huge.tfrecord")
    data = bytearray(_write_valid(path))
    for huge in (
        0xFFFFFFFFFFFFFFF0,
        0xFFFFFFFFFFFFFFFF,
        1 << 63,
        len(data) + 1,
    ):
        data[0:8] = int(huge).to_bytes(8, "little")
        with open(path, "wb") as f:
            f.write(data)
        _parse_all_entry_points(path)


def test_truncations(tmp_path, alarm):
    path = str(tmp_path / "t.tfrecord")
    data = _write_valid(path)
    # Cut inside the header, payload, and trailing CRC of various records.
    for cut in [0, 1, 5, 11, 12, 13, len(data) // 2, len(data) - 3,
                len(data) - 1]:
        with open(path, "wb") as f:
            f.write(data[:cut])
        _parse_all_entry_points(path)


def test_random_byte_flips(tmp_path, alarm):
    path = str(tmp_path / "flip.tfrecord")
    data = _write_valid(path)
    rng = np.random.default_rng(20260818)
    for _ in range(200):
        mutated = bytearray(data)
        for _ in range(int(rng.integers(1, 6))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] = int(rng.integers(0, 256))
        with open(path, "wb") as f:
            f.write(mutated)
        _parse_all_entry_points(path)


def test_random_garbage_files(tmp_path, alarm):
    rng = np.random.default_rng(7)
    for i, size in enumerate([0, 1, 11, 12, 13, 64, 4096]):
        path = str(tmp_path / f"g{i}.bin")
        with open(path, "wb") as f:
            f.write(rng.integers(0, 256, size=size, dtype=np.uint8)
                    .tobytes())
        _parse_all_entry_points(path)


def test_valid_suffix_after_corrupt_record_is_dropped_not_crashed(
    tmp_path, alarm
):
    # Framing is not self-resynchronizing: a bad length mid-file ends
    # the parse at that record. The contract under test is bounded
    # termination with the PREFIX parsed, never an overrun.
    path = str(tmp_path / "mid.tfrecord")
    data = bytearray(_write_valid(path))
    # Second record's length header starts after record 0's frame.
    first_len = int.from_bytes(data[0:8], "little")
    second_hdr = 12 + first_len + 4
    data[second_hdr : second_hdr + 8] = int(
        0xFFFFFFFFFFFFFF00
    ).to_bytes(8, "little")
    with open(path, "wb") as f:
        f.write(bytes(data))
    rows = native_io.parse_file_columns(path, KEYS)
    assert len(rows) == 1  # the intact prefix record
    np.testing.assert_array_equal(
        rows[0]["feat_i"], np.arange(3, dtype=np.int64)
    )
