"""bench.py wedge guard: a dead backend must yield an error JSON line.

The tunneled-TPU backend can wedge (devices enumerate, every execution
hangs ~50 min — CLAUDE.md wedge model). The driver runs `python bench.py`
unconditionally at round end; without the guard a wedged chip means the
run hangs until killed and records nothing. These tests pin both sides
of the guard without touching the real tunnel.
"""

import io
import json
import sys

import bench


def test_wedged_chip_prints_error_json(monkeypatch):
    monkeypatch.setattr(bench, "_chip_alive", lambda: False)
    monkeypatch.delenv("BENCH_SKIP_PROBE", raising=False)
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.main()  # must return fast, not hang into the measurement
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert out["metric"] == "dlrm_dcnv2_train_examples_per_sec"
    assert out["value"] == 0 and out["vs_baseline"] == 0
    assert "wedged" in out["error"]


def test_probe_passes_on_live_backend(monkeypatch):
    # The subprocess inherits this test env (CPU backend) — a live
    # backend must pass so the guard never suppresses a real bench run.
    # Generous timeout: on this 1-core host a concurrent chip-queue
    # compile job can stretch the subprocess's jax import well past the
    # production 240 s default (observed flake, round 5).
    monkeypatch.setenv("KRT_PROBE_TIMEOUT", "900")
    assert bench._chip_alive()


def test_skip_probe_env_bypasses_guard(monkeypatch):
    # BENCH_SKIP_PROBE=1 must skip the probe entirely (chip_queue.sh
    # already probed; no reason to spend another subprocess compile).
    monkeypatch.setenv("BENCH_SKIP_PROBE", "1")

    def boom():
        raise AssertionError("probe must not run")

    monkeypatch.setattr(bench, "_chip_alive", boom)
    # main() would proceed into the (expensive) measurement; stub the
    # mesh import boundary by faking the first thing it touches.
    called = {}

    import keras_rs_tpu.parallel.mesh as mesh_lib

    def fake_create_mesh():
        called["yes"] = True
        raise RuntimeError("stop before measurement")

    monkeypatch.setattr(mesh_lib, "create_mesh", fake_create_mesh)
    try:
        bench.main()
    except RuntimeError:
        pass
    assert called.get("yes")
