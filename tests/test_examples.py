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


@pytest.mark.parametrize(
    "module,expect",
    [
        ("examples.basic_ranking", ""),
        ("examples.basic_retrieval", ""),
        ("examples.listwise_ranking", "NDCG@5"),
        ("examples.dcn", ""),
        ("examples.sequential_retrieval", "recall"),
        ("examples.sas_rec", "recall"),
        ("examples.multi_task", ""),
        ("examples.deep_recommender", "recall@10"),
    ],
)
def test_example_runs(module, expect):
    """Every example must run end-to-end (regression: a tower-shape bug
    in listwise_ranking went unnoticed because only 2 examples were
    smoke-tested)."""
    r = run_example(module)
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
    if expect:
        assert expect in r.stdout, r.stdout[-2000:]
