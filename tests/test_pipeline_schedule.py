"""Pipelined mode's multi-chip value, proven at the compiler level.

On one chip the one-step-stale mode is ~4% slower (TensorCore kernels
serialize — BASELINE.md); its value is that the embedding exchange
collectives lose their data dependency on the dense stack, so a
latency-hiding scheduler may overlap them on a mesh. This test runs
tools/pipeline_schedule.py's analysis over the compiled 8-device SPMD
programs and asserts the dependency contrast (VERDICT r3 missing #4):

  * unpipelined: the forward exchange (id all-to-alls + activation
    reduce-scatter) GATES the dense matmuls — ~0 overlappable dots.
  * pipelined: every exchange collective is free of the dense stack —
    ~all dots overlappable. Only the dense-gradient all-reduce (and the
    backward cotangent all-gather, intrinsically ordered by d_acts)
    remain constrained, in BOTH modes.
"""

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
    ),
)


@pytest.fixture(scope="module")
def schedules():
    import pipeline_schedule

    pi, un = pipeline_schedule.build_steps()
    return (
        pipeline_schedule.analyze(pi.as_text()),
        pipeline_schedule.analyze(un.as_text()),
    )


def _rows(res, opcodes):
    return [
        r
        for r in res["collectives"]
        if any(r["opcode"].startswith(o) for o in opcodes)
    ]


def test_unpipelined_forward_exchange_gates_dense(schedules):
    _, un = schedules
    exchange = _rows(un, ("all-to-all", "reduce-scatter"))
    assert exchange, "no exchange collectives found"
    gated = [r for r in exchange if r["overlappable_frac"] < 0.15]
    # The forward id exchange + activation reduce-scatter must all gate
    # the dense stack (acts feed the MLPs). The dedup-structure
    # all-to-alls (backward-only consumers) are legitimately free.
    assert len(gated) >= 4, exchange


def test_pipelined_exchange_is_dense_independent(schedules):
    pi, _ = schedules
    exchange = _rows(pi, ("all-to-all", "reduce-scatter"))
    assert len(exchange) >= 4, exchange
    for r in exchange:
        assert r["overlappable_frac"] >= 0.9, r


def test_dense_grad_allreduce_constrained_in_both(schedules):
    pi, un = schedules
    for res in (pi, un):
        ar = _rows(res, ("all-reduce",))
        # The dense-gradient all-reduce (the largest all-reduce) is
        # ordered after the dense backward in both modes.
        big = max(ar, key=lambda r: r["out_bytes"])
        assert big["overlappable_frac"] == 0.0, big


def test_pipelined_frees_strictly_more_comm_bytes(schedules):
    pi, un = schedules
    free_bytes = lambda res: sum(  # noqa: E731
        r["out_bytes"]
        for r in res["collectives"]
        if r["overlappable_frac"] >= 0.9
    )
    assert free_bytes(pi) > free_bytes(un)
