"""Smoke tests for the examples (small subset, fast settings)."""

import subprocess
import sys

import pytest


def run_example(module, *args, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=timeout,
        env={
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "PYTHONPATH": "/root/repo",
        },
    )


def test_ml_perf_smoke():
    r = run_example("examples.ml_perf.main", "--config", "smoke_test")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "results" in r.stderr or "results" in r.stdout


def test_data_parallel_retrieval_example():
    r = run_example("examples.data_parallel_retrieval")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "final loss" in r.stdout
