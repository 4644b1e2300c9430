"""Worker for the 2-process ml_perf multi-host smoke test.

Run by tests/test_mlperf_multihost.py as:
    python tests/mlperf_multihost_worker.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices and runs the REAL MLPerf
entry point (examples/ml_perf/main.py) end to end — mesh over both
hosts, per-process data sharding, jitted hybrid train steps, eval — the
multi-host launch pattern of the reference's run.sh (one process per
host, jax.distributed coordination)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    # Optional: devices per process (argv[4]) and JSON config overrides
    # (argv[5]) — the 4-process test uses 2 devices each and a
    # file-backed dataset to exercise per-host file sharding.
    devices_per_process = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    overrides = json.loads(sys.argv[5]) if len(sys.argv) > 5 else {}

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes

    from examples.ml_perf.main import main as mlperf_main

    results = mlperf_main(
        "smoke_test",
        **{
            "num_steps": 5,
            "global_batch_size": 256,
            "checkpoint_dir": None,
            **overrides,
        },
    )
    # Deterministic dummy data + jit over the global mesh: every process
    # computes the SAME global loss/AUC. Print for cross-process compare.
    print(
        f"WORKER_OK {process_id} loss={results['loss']:.8f} "
        f"auc={results['auc']:.8f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
