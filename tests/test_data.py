"""Data subsystem tests: TFRecord/Example round-trip, Criteo reader
(decode_raw style and native lists), host sharding with identical shuffle,
threaded loader."""

import os

import numpy as np
import pytest

from keras_rs_tpu.data.criteo import CriteoDataset
from keras_rs_tpu.data.loader import ThreadedDataLoader
from keras_rs_tpu.data.tfrecord import (
    make_example,
    parse_example,
    read_tfrecords,
    write_tfrecord,
)


def test_example_roundtrip():
    ex = make_example(
        {
            "floats": np.array([1.5, -2.0, 3.25], np.float32),
            "ints": np.array([7, -3, 1 << 40], np.int64),
            "raw": b"\x01\x02\x03",
        }
    )
    parsed = parse_example(ex)
    np.testing.assert_allclose(parsed["floats"], [1.5, -2.0, 3.25])
    np.testing.assert_array_equal(parsed["ints"], [7, -3, 1 << 40])
    assert parsed["raw"] == [b"\x01\x02\x03"]


def test_tfrecord_file_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "data.tfrecord")
    records = [b"abc", b"x" * 1000, b""]
    write_tfrecord(path, records)
    assert list(read_tfrecords(path)) == records


def make_criteo_files(tmp_path, num_files=2, rows_per_file=32,
                      vocab_sizes=(100, 50), multi_hot=(2, 1)):
    rng = np.random.default_rng(0)
    for fi in range(num_files):
        records = []
        for _ in range(rows_per_file):
            feats = {
                "label": np.asarray(
                    [rng.integers(0, 2)], np.int32
                ).astype("<i4").tobytes(),
                "dense_features": rng.normal(size=13)
                .astype("<f4")
                .tobytes(),
            }
            for i, (v, m) in enumerate(zip(vocab_sizes, multi_hot)):
                feats[f"categorical_feature_{i}"] = rng.integers(
                    0, v, size=m
                ).astype("<i8").tobytes()
            records.append(make_example(feats))
        write_tfrecord(
            os.path.join(tmp_path, f"part-{fi}.tfrecord"), records
        )
    return os.path.join(tmp_path, "part-*.tfrecord")


def test_criteo_reader(tmp_path):
    pattern = make_criteo_files(tmp_path)
    ds = CriteoDataset(
        pattern,
        global_batch_size=16,
        vocab_sizes=[100, 50],
        multi_hot_sizes=[2, 1],
    )
    batches = list(ds.batches())
    assert len(batches) == 4  # 64 rows / 16
    b = batches[0]
    assert b["dense"].shape == (16, 13)
    assert b["cat_0"].shape == (16, 2)
    assert b["cat_1"].shape == (16, 1)
    assert b["label"].shape == (16,)
    assert set(np.unique(b["label"])) <= {0.0, 1.0}
    assert b["cat_0"].max() < 100


def test_criteo_host_sharding_identical_shuffle(tmp_path):
    pattern = make_criteo_files(tmp_path)
    shards = []
    for pi in range(2):
        ds = CriteoDataset(
            pattern,
            global_batch_size=16,
            vocab_sizes=[100, 50],
            multi_hot_sizes=[2, 1],
            process_index=pi,
            process_count=2,
            shuffle_seed=3,
        )
        shards.append(list(ds.batches()))
    # Each host sees half of each global batch; concatenation rebuilds the
    # full batch because the shuffle is seeded identically.
    full = CriteoDataset(
        pattern,
        global_batch_size=16,
        vocab_sizes=[100, 50],
        multi_hot_sizes=[2, 1],
        shuffle_seed=3,
    )
    for b0, b1, bf in zip(shards[0], shards[1], full.batches()):
        assert b0["dense"].shape == (8, 13)
        np.testing.assert_array_equal(
            np.concatenate([b0["dense"], b1["dense"]]), bf["dense"]
        )


def test_criteo_dummy_mode():
    ds = CriteoDataset(
        None,
        global_batch_size=8,
        vocab_sizes=[10, 20],
        multi_hot_sizes=[1, 3],
    )
    batches = list(ds.dummy_batches(3))
    assert len(batches) == 3
    assert batches[0]["cat_1"].shape == (8, 3)


def test_threaded_loader_processes_all():
    source = iter(range(50))
    loader = ThreadedDataLoader(
        source, lambda x: x * 2, num_workers=4, buffer_size=4
    )
    out = sorted(loader)
    assert out == [2 * i for i in range(50)]


def test_threaded_loader_propagates_errors():
    def bad(x):
        if x == 5:
            raise ValueError("boom")
        return x

    loader = ThreadedDataLoader(iter(range(10)), bad, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader)


def test_multihost_helpers_single_process():
    from keras_rs_tpu.parallel import multihost

    stats = multihost.sync_max_stats({"a": 3, "b": 7})
    assert stats == {"a": 3, "b": 7}
    gathered = multihost.process_allgather(np.array([1, 2]))
    assert np.asarray(gathered).shape == (1, 2)


def test_native_tfrecord_reader_matches_python(tmp_path, monkeypatch):
    """The native column reader must produce bit-identical batches to
    the pure-Python row path (data/native_io.py; ~30x the record rate)."""
    import numpy as np

    from keras_rs_tpu.data import native_io
    from keras_rs_tpu.data.criteo import CriteoDataset
    from keras_rs_tpu.data.tfrecord import make_example, write_tfrecord

    if not native_io.available():
        import pytest

        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(0)
    vocab, mh = [50, 100, 20], [3, 1, 2]
    recs = []
    for j in range(300):
        feats = {
            "label": np.asarray([j % 2], np.int32)
            .astype("<i4").tobytes(),
            "dense_features": rng.normal(size=13)
            .astype("<f4").tobytes(),
        }
        for i, (v, m) in enumerate(zip(vocab, mh)):
            feats[f"categorical_feature_{i}"] = rng.integers(
                0, v, size=m
            ).astype("<i8").tobytes()
        recs.append(make_example(feats))
    path = str(tmp_path / "a.tfrecord")
    write_tfrecord(path, recs)

    ds = CriteoDataset(
        path, global_batch_size=128, vocab_sizes=vocab,
        multi_hot_sizes=mh,
    )
    native_batches = list(ds.batches())
    # Force the Python fallback.
    monkeypatch.setattr(native_io, "available", lambda: False)
    py_batches = list(ds.batches())
    assert len(native_batches) == len(py_batches) == 2
    for a, b in zip(native_batches, py_batches):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_criteo_file_batched_schema(tmp_path, monkeypatch):
    """Reference file-batched schema: native == Python, right shapes.

    Parity target: ml_perf/dataloader.py:135-181 (label Int64List[N],
    per-key dense FloatLists, categorical BytesLists of raw-i64
    strings) with file_batch_size from configs/v6e_8_full_dataset.py.
    """
    from keras_rs_tpu.data import native_io
    from keras_rs_tpu.data.criteo import write_batched_criteo_files

    vocab, mh = [500, 30, 80], [3, 1, 5]
    write_batched_criteo_files(
        str(tmp_path),
        num_files=2,
        protos_per_file=2,
        file_batch_size=32,
        vocab_sizes=vocab,
        multi_hot_sizes=mh,
        seed=3,
    )
    ds = CriteoDataset(
        str(tmp_path / "*.tfrecord"),
        global_batch_size=16,
        vocab_sizes=vocab,
        multi_hot_sizes=mh,
        file_batch_size=32,
    )
    assert ds.label_key == "clicked"
    native_batches = list(ds.batches())
    assert len(native_batches) == (2 * 2 * 32) // 16
    b = native_batches[0]
    assert b["dense"].shape == (16, 13)
    assert b["cat_0"].shape == (16, 3)
    assert b["cat_2"].shape == (16, 5)
    assert set(np.unique(b["label"])) <= {0.0, 1.0}
    assert b["cat_0"].max() < 500 and b["cat_0"].min() >= 0

    monkeypatch.setattr(native_io, "available", lambda: False)
    py_batches = list(ds.batches())
    assert len(py_batches) == len(native_batches)
    for a, c in zip(native_batches, py_batches):
        assert set(a) == set(c)
        for k in a:
            np.testing.assert_array_equal(a[k], c[k], err_msg=k)


def test_native_reader_single_pass_ratio_cache(tmp_path):
    """Second file of a schema parses via the single-pass path and
    returns identical results (the learned-ratio protocol)."""
    from keras_rs_tpu.data import native_io

    rng = np.random.default_rng(0)
    paths = []
    for f in range(2):
        recs = []
        for j in range(40):
            recs.append(
                make_example(
                    {
                        "x": rng.integers(0, 99, size=4),
                        "y": rng.normal(size=3).astype(np.float32),
                    }
                )
            )
        p = str(tmp_path / f"f{f}.tfrecord")
        write_tfrecord(p, recs)
        paths.append(p)
    if not native_io.available():
        return
    native_io._est_cache.clear()
    n0, cols0 = native_io.parse_file_batched(paths[0], ["x", "y"])
    assert ("x", "y") in native_io._est_cache
    n1, cols1 = native_io.parse_file_batched(paths[1], ["x", "y"])
    assert n0 == n1 == 40
    assert cols1["x"][1].shape == (40, 4)
    # Undersized guess retries exactly: poison the cache and reparse.
    native_io._est_cache[("x", "y")] = (1e-9, 1e-9)
    n2, cols2 = native_io.parse_file_batched(paths[1], ["x", "y"])
    assert n2 == 40
    np.testing.assert_array_equal(cols1["x"][1], cols2["x"][1])


def test_criteo_batch_spans_multiple_files(tmp_path):
    """A global batch larger than a whole file assembles across 3+ file
    boundaries (the boundary-batch path concatenates ONLY the boundary
    batch) and the stream equals a big-file reference stream."""
    from keras_rs_tpu.data.criteo import write_batched_criteo_files

    vocab, mh = [100, 40], [2, 1]
    # 6 files x 1 proto x 24 records = 144 records; batch 64 spans 3
    # files; 144 // 64 = 2 batches, 16-record tail dropped.
    write_batched_criteo_files(
        str(tmp_path),
        num_files=6,
        protos_per_file=1,
        file_batch_size=24,
        vocab_sizes=vocab,
        multi_hot_sizes=mh,
        seed=7,
    )
    ds = CriteoDataset(
        str(tmp_path / "*.tfrecord"),
        global_batch_size=64,
        vocab_sizes=vocab,
        multi_hot_sizes=mh,
        file_batch_size=24,
    )
    got = list(ds.batches())
    assert len(got) == 2
    for b in got:
        assert b["label"].shape == (64,)
        assert b["cat_0"].shape == (64, 2)

    # Reference stream: same files consumed with batch 24 == file size
    # (no boundary assembly), re-chunked to 64 on the host.
    ds24 = CriteoDataset(
        str(tmp_path / "*.tfrecord"),
        global_batch_size=24,
        vocab_sizes=vocab,
        multi_hot_sizes=mh,
        file_batch_size=24,
    )
    ref = list(ds24.batches())
    cat = {
        k: np.concatenate([b[k] for b in ref]) for k in ref[0]
    }
    for i, b in enumerate(got):
        for k in b:
            np.testing.assert_array_equal(
                b[k], cat[k][i * 64 : (i + 1) * 64], err_msg=k
            )


def test_criteo_fixed_column_path(tmp_path):
    """The steady-state fixed-column path (tfrec_parse_file_cols):
    schema learned from file 1, later files parse straight into final
    arrays bit-identically; an undersized record estimate retries
    exactly; a schema-deviating file falls back to the generic path."""
    from keras_rs_tpu.data import native_io
    from keras_rs_tpu.data.criteo import write_batched_criteo_files

    if not native_io.available():
        return
    vocab, mh = [300, 70, 1000], [2, 1, 4]
    write_batched_criteo_files(
        str(tmp_path),
        num_files=3,
        protos_per_file=2,
        file_batch_size=16,
        vocab_sizes=vocab,
        multi_hot_sizes=mh,
        seed=11,
    )
    ds = CriteoDataset(
        str(tmp_path / "*.tfrecord"),
        global_batch_size=16,
        vocab_sizes=vocab,
        multi_hot_sizes=mh,
        file_batch_size=16,
    )
    keys = ds._file_keys()
    files = sorted((tmp_path).glob("*.tfrecord"))
    assert ds._fixed_schema is None
    ref = [ds._parse_file_arrays(str(p), keys, True) for p in files]
    schema, n_est = ds._fixed_schema
    assert n_est == 2 and len(schema) == len(keys)
    # Files 2-3 took the fixed path; re-derive them generically and
    # compare bit-for-bit.
    for p, want in zip(files, ref):
        n, cols = native_io.parse_file_batched(str(p), keys)
        gen = ds._batched_columns_to_arrays(cols)
        assert set(gen) == set(want)
        for k in gen:
            assert want[k].dtype == gen[k].dtype, k
            np.testing.assert_array_equal(want[k], gen[k], err_msg=k)

    # Undersized record estimate: the -3 handshake retries exactly.
    res = native_io.parse_file_fixed(str(files[1]), keys, schema, 1)
    assert res is not None and res[0] == 2
    np.testing.assert_array_equal(
        res[1][keys[0]][1].reshape(-1).astype(np.float32),
        ref[1]["label"],
    )

    # Schema deviation (wrong width): native reports -4, caller gets
    # None and _parse_file_arrays falls back to the generic path.
    bad = [(k, w + 8) for k, w in schema]
    assert (
        native_io.parse_file_fixed(str(files[1]), keys, bad, 4) is None
    )
    ds._fixed_schema = (bad, 2)
    out = ds._parse_file_arrays(str(files[1]), keys, True)
    for k in out:
        np.testing.assert_array_equal(out[k], ref[1][k], err_msg=k)


def test_parse_file_columns_survives_next_parse(tmp_path):
    """parse_file_columns returns PRIVATE views: parsing a second file
    with the same key set must not overwrite rows from the first
    (regression: the pooled-buffer change briefly aliased them)."""
    from keras_rs_tpu.data import native_io
    from keras_rs_tpu.data.tfrecord import make_example, write_tfrecord

    if not native_io.available():
        return
    paths = []
    for f in range(2):
        recs = [
            make_example(
                {
                    "b": np.full(4, f, np.uint8).tobytes(),
                    "x": np.full(3, f, np.int64),
                    "y": np.full(2, float(f), np.float32),
                }
            )
            for _ in range(8)
        ]
        p = str(tmp_path / f"cols{f}.tfrecord")
        write_tfrecord(p, recs)
        paths.append(p)
    rows_a = native_io.parse_file_columns(paths[0], ["b", "x", "y"])
    snap = (
        bytes(rows_a[0]["b"][0]),
        rows_a[0]["x"].copy(),
        rows_a[0]["y"].copy(),
    )
    _ = native_io.parse_file_columns(paths[1], ["b", "x", "y"])
    assert bytes(rows_a[0]["b"][0]) == snap[0]
    np.testing.assert_array_equal(rows_a[0]["x"], snap[1])
    np.testing.assert_array_equal(rows_a[0]["y"], snap[2])


def test_parse_file_batched_copy_bytes(tmp_path):
    """kind-0 columns are pooled views by default (documented lifetime)
    and private arrays with copy_bytes=True."""
    from keras_rs_tpu.data import native_io
    from keras_rs_tpu.data.tfrecord import make_example, write_tfrecord

    if not native_io.available():
        return
    paths = []
    for f in range(2):
        recs = [
            make_example({"raw": np.full(8, f, np.uint8).tobytes()})
            for _ in range(6)
        ]
        p = str(tmp_path / f"bytes{f}.tfrecord")
        write_tfrecord(p, recs)
        paths.append(p)
    _, cols_a = native_io.parse_file_batched(
        paths[0], ["raw"], copy_bytes=True
    )
    kind, arr_a = cols_a["raw"]
    assert kind == 0
    snap = arr_a.copy()
    _, _ = native_io.parse_file_batched(
        paths[1], ["raw"], copy_bytes=True
    )
    np.testing.assert_array_equal(arr_a, snap)


def test_byteslist_foreign_field_skipped(tmp_path):
    """The native BytesList tight loop must skip unknown fields between
    elements (proto3 forward compatibility) exactly like the Python
    parser: only field-1 elements' bytes are concatenated."""
    import numpy as np

    from keras_rs_tpu.data import native_io
    from keras_rs_tpu.data.tfrecord import (
        _len_delimited,
        _parse_feature,
        write_tfrecord,
    )

    if not native_io.available():
        import pytest

        pytest.skip("no C++ toolchain")

    # BytesList: element, foreign varint field (2), element, foreign
    # length-delimited field (3), element.
    bl = (
        _len_delimited(1, b"hello")
        + b"\x10\x2a"  # field 2, wire 0, value 42
        + _len_delimited(1, b"world")
        + _len_delimited(3, b"junk")
        + _len_delimited(1, b"!")
    )
    feature = _len_delimited(1, bl)
    entry = _len_delimited(1, b"x") + _len_delimited(2, feature)
    example = _len_delimited(1, _len_delimited(1, entry))
    path = str(tmp_path / "foreign.tfrecord")
    write_tfrecord(path, [example])

    n, buf, offsets, kinds = native_io._parse_raw(path, ["x"])
    assert n == 1 and kinds[0] == 0
    got = bytes(buf[offsets[0] : offsets[1]])
    assert got == b"helloworld!"
    # Python parser agreement.
    assert b"".join(_parse_feature(feature)) == b"helloworld!"
