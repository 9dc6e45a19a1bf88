"""Runtime tracing / timing helpers (SURVEY.md §5 tracing plan).

The reference has *no* runtime tracing — its profiling story is the static
FPGA report (``/root/reference/Makefile:26,38-39``), covered here by
``utils/report.py``.  This module supplies the runtime half the TPU platform
adds on top:

  * ``trace(dir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard/XProf trace of everything executed inside.
  * ``device_time(fn, *args)`` — robust per-call wall time of a jitted
    function using the chained-call delta method (dispatch through this
    environment's TPU tunnel makes one-shot timing meaningless; see
    bench.py).
  * ``dump_hlo(fn, *args)`` — optimized HLO text for any jittable callable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block into `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dump_hlo(fn: Callable, *args, **kwargs) -> str:
    """Optimized (post-XLA-passes) HLO text for fn(*args, **kwargs)."""
    return jax.jit(fn).lower(*args, **kwargs).compile().as_text()


def device_time(
    fn: Callable, x: jnp.ndarray, iters: int = 10, trials: int = 3
) -> float:
    """Seconds per call of y = fn(y) on device, excluding constant dispatch
    and sync overhead (delta method: time k chained calls minus one call;
    each call's input depends on the previous output so nothing overlaps).

    Tunnel stalls are one-sided noise, so the baseline and the chained
    measurement are min-reduced SEPARATELY before subtracting — subtracting
    a single (possibly stalled) baseline sample from a clean chained sample
    would overestimate throughput, sometimes past the hardware ceiling.
    """

    def run(k):
        v = x
        for _ in range(k):
            v = fn(v)
        # scalar readback forces execution of the whole chain
        return int(jnp.sum(v.ravel()[0]).astype(jnp.uint32) % jnp.uint32(97))

    run(1)  # warm / compile

    def sample(k):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            run(k)
            best = min(best, time.perf_counter() - t0)
        return best

    t_one = sample(1)
    t_many = sample(1 + iters)
    return max((t_many - t_one) / iters, 1e-9)
