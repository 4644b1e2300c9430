"""Honest device-time measurement for tunneled/async JAX runtimes.

On this machine's tunneled TPU, `jax.block_until_ready` returns BEFORE
execution completes, so a Python loop over dispatches measures dispatch
fiction, not compute (BASELINE.md "honest timing protocol"; the
reference's MLPerf loop can rely on local runtimes where blocking is
truthful — examples/ml_perf/main.py:188-208). The protocol here:

  1. chain M iterations inside ONE jitted `lax.scan` — the carry's data
     dependency forces serial execution on device;
  2. end with a host read (`float(loss)`) — the only operation that
     provably waits for completion;
  3. subtract the measured host round-trip (`measure_host_rt`).

The scan body must consume the carry in the measured op's inputs and
derive the next carry from a data-dependent value, or XLA hoists/DCEs
the body (train steps satisfy this naturally: state -> loss -> state).
"""

from __future__ import annotations

import functools
import time

import numpy as np


def make_scan_runner(step, iters: int):
    """Jit of `iters` chained `step(state, batch)` calls.

    Donates the state: without donation XLA copies the full tables+slots
    into the loop carry (~0.9 ms/step of pure artifact at DLRM bench
    shape). The donated buffers reappear in the output (the final scan
    state), which is required for donation to engage at all — read only
    the scalar loss on the host.
    """
    import jax

    raw = getattr(step, "__wrapped__", step)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, batch):
        def body(s, _):
            s2, loss = raw(s, batch)
            return s2, loss

        s_final, losses = jax.lax.scan(body, state, None, length=iters)
        return s_final, losses[-1]

    return run


def time_block(run, state, batch, host_rt: float):
    """One timed scan block; returns (elapsed_s, final_state)."""
    t0 = time.perf_counter()
    state, loss = run(state, batch)
    _ = float(loss)  # host read = true completion
    return max(time.perf_counter() - t0 - host_rt, 1e-9), state


def measure_host_rt() -> float:
    """Round-trip cost of dispatch + host read of a trivial program."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def noop(x):
        return x * 1.0000001

    x = jnp.zeros(())
    _ = float(noop(x))
    t0 = time.perf_counter()
    for _ in range(5):
        x = noop(x)
        _ = float(x)
    return (time.perf_counter() - t0) / 5


def measure_step_time(
    step, state, batch, iters: int = 20, blocks: int = 5
):
    """Median per-step device seconds of `step` under the scan protocol.

    Returns (s_per_step, final_state). The state buffers passed in are
    DONATED — use the returned state afterwards.
    """
    host_rt = measure_host_rt()
    run = make_scan_runner(step, iters)
    _, state = time_block(run, state, batch, host_rt)  # compile + warm
    ts = []
    for _ in range(blocks):
        el, state = time_block(run, state, batch, host_rt)
        ts.append(el)
    return float(np.median(ts)) / iters, state
