"""2-process jax.distributed smoke of the REAL MLPerf entry point.

tests/test_multihost.py proves the DistributedEmbedding layer works
across processes; this test drives the actual flagship workload
(examples/ml_perf/main.py) the way the reference's run.sh launches it —
one process per host, a global mesh spanning both — and asserts the
training result is bitwise-identical on every process (same global
batch, same jitted program).
"""

import re
import socket
import subprocess
import sys
from pathlib import Path


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(port, num_processes=2, devices_per_process=4, overrides=None):
    import json

    worker = Path(__file__).parent / "mlperf_multihost_worker.py"
    extra = [str(devices_per_process)]
    if overrides is not None:
        extra.append(json.dumps(overrides))
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(worker), str(i),
                str(num_processes), str(port), *extra,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(Path(__file__).parent.parent),
        )
        for i in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=540)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return procs, outs


def _run_and_check(num_processes, devices_per_process=4, overrides=None):
    # Retries: free-port handoff can race; the CPU-collective rendezvous
    # can time out under full-suite load (see CLAUDE.md).
    for attempt in range(3):
        procs, outs = _launch(
            _free_port(),
            num_processes=num_processes,
            devices_per_process=devices_per_process,
            overrides=overrides,
        )
        ok = all(p.returncode == 0 for p in procs) and all(
            f"WORKER_OK {i}" in out for i, out in enumerate(outs)
        )
        if ok:
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {i}" in out, out[-2000:]

    # The global loss and AUC must be IDENTICAL across processes.
    vals = []
    for out in outs:
        m = re.search(r"WORKER_OK \d+ loss=([\d.nan-]+) auc=([\d.nan-]+)", out)
        assert m, out[-2000:]
        vals.append((m.group(1), m.group(2)))
    assert len(set(vals)) == 1, vals
    assert "nan" not in vals[0][0], vals


def test_mlperf_two_process():
    _run_and_check(2)


def test_mlperf_four_process_file_sharded(tmp_path):
    """4 processes × 2 devices, training from per-host-sharded FILES.

    Beyond the 2-process smoke this exercises >2-party rendezvous,
    4-way host-shard batch assembly (multihost.global_batch_from_host
    _shards), and CriteoDataset's process_index/process_count file
    sharding — each worker reads a DISJOINT 2-file subset, yet the
    jitted global program must produce bitwise-identical loss/AUC on
    every process (VERDICT r3 #9)."""
    from keras_rs_tpu.data import criteo

    vocab_sizes = [100, 80, 60, 40]
    multi_hot_sizes = [3, 2, 1, 1]
    criteo.write_batched_criteo_files(
        str(tmp_path),
        num_files=8,
        protos_per_file=2,
        file_batch_size=128,
        vocab_sizes=vocab_sizes,
        multi_hot_sizes=multi_hot_sizes,
        seed=7,
        learnable=True,
    )
    _run_and_check(
        4,
        devices_per_process=2,
        overrides={
            "file_pattern": str(tmp_path / "*.tfrecord"),
            "file_batch_size": 128,
            "vocab_sizes": vocab_sizes,
            "multi_hot_sizes": multi_hot_sizes,
            "num_steps": 3,
            "global_batch_size": 128,
        },
    )
