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


def under_trace() -> bool:
    """True when called inside an enclosing jax trace (jit/vmap/grad/...).

    Pure trace-state query — no device computation on the fast path.  Used
    to keep device arrays created under a trace out of eager caches (tracer
    leak) and to give eager-only debug helpers a clear error instead of an
    opaque TracerConversionError.

    ``jax.core.trace_ctx`` is a private attribute; if a JAX upgrade renames
    it we fall back to a behavioral probe (does arithmetic on a fresh array
    yield a Tracer?) rather than silently reporting "not traced"
    (``tests/test_report.py`` pins both behaviors).
    """
    try:
        return type(jax.core.trace_ctx.trace).__name__ != "EvalTrace"
    except AttributeError:
        return isinstance(
            jnp.zeros((), jnp.uint32) + jnp.uint32(0), jax.core.Tracer
        )


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


def _trace_per_call_seconds(tr: dict, iters: int | None = None) -> float | None:
    """Seconds-per-call from a loaded ``*.trace.json`` dict (pure parser).

    Split out of ``device_time_profiled`` so the event-accounting rules can
    be unit-tested against synthetic trace fixtures without a device
    (``tests/test_profiling.py``).  The rules, each learned the hard way:

    1. **Device pids only** — host-side events carry tunnel/dispatch jitter.
    2. **Top-level events only.**  A TPU trace contains BOTH the module
       event (``jit_fwd_ntt``) and its nested op events (``fwd_ntt.1``)
       with identical or contained spans, on different tids of the same
       device pid.  Summing every repeated name counts the same device
       nanoseconds once per nesting level (the round-3 2.0x bug,
       VERDICT.md round 3 weak-1; hardware-verified ratio 2.04).  An event
       is kept iff no already-kept event on the same pid covers its whole
       span; identical spans keep exactly one.
    3. **Per-name normalization by CAPTURED count, not `iters`.**  Through
       the tunnel the trailing executions can miss the stop_trace flush
       (observed: 3 of 8 eager pallas calls captured), and different
       executables can lose different counts — so each surviving name is
       normalized by its own count, then summed.  This keeps
       multi-executable paths (two-kernel four-step + its HBM relayout
       copies) fully accounted, which dominant-name-only accounting (the
       round-2 form) undercounted.
    4. **Names seen once are per-chain, not per-call** (the scalar-readback
       reduce/slice launches run once per chained run) and are excluded;
       if nothing repeats (tiny iters / heavy flush loss) fall back to the
       dominant event.
    5. **Multi-dispatch multiplicity** (round-4 bug, caught by the composed
       linear-transform bench): rule 3 implicitly assumes each executable
       runs ONCE per call — a Python loop dispatching the same jitted
       keyswitch 16x per call got counted as one execution, inflating the
       composed form 16x.  When the caller passes ``iters`` (the number of
       chained calls), a second accounting divides the TOTAL busy time of
       repeated names by ``iters`` — exact under full capture for any
       dispatch multiplicity, an undercount only under flush loss.  Both
       accountings are lower bounds of the truth; the MAX is returned.
    """
    from collections import defaultdict

    evs = tr.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    if not device_pids:
        return None
    # Top-level filter: per device pid, sweep events by (start asc, dur
    # desc); an event whose end falls at or before the running max end of
    # already-kept events is covered by one of them (all kept events
    # started no later than it) and is dropped.  Identical spans keep the
    # first.  TPU device events nest cleanly, so "covered" == "nested".
    by_pid: defaultdict[object, list] = defaultdict(list)
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            ts = float(e.get("ts", 0.0))
            dur = float(e.get("dur", 0.0))
            by_pid[e["pid"]].append((ts, -dur, e["name"]))
    totals: defaultdict[str, list] = defaultdict(lambda: [0.0, 0])
    for pid_events in by_pid.values():
        pid_events.sort()
        max_end = float("-inf")
        for ts, neg_dur, name in pid_events:
            end = ts - neg_dur
            if end <= max_end:
                continue  # covered by an earlier-starting kept event
            max_end = end
            t = totals[name]
            t[0] += -neg_dur
            t[1] += 1
    if not totals:
        return None
    per_call = {n: t[0] / t[1] for n, t in totals.items() if t[1] > 1}
    if not per_call:  # nothing repeated (tiny iters / heavy flush loss):
        busy_us, count = max(totals.values(), key=lambda t: t[0])
        return busy_us * 1e-6 / count
    per_name = sum(per_call.values())
    if not iters:
        return per_name * 1e-6
    # rule 5: chain-level accounting for multi-dispatch-per-call paths
    # (once-only names stay excluded: the per-chain scalar readback)
    per_chain = sum(
        t[0] for t in totals.values() if t[1] > 1
    ) / iters
    return max(per_name, per_chain) * 1e-6


def device_time_profiled(
    fn: Callable,
    x: jnp.ndarray,
    iters: int = 8,
    log_dir: str | None = None,
) -> float | None:
    """True on-device seconds per call of y = fn(y), from a profiler trace.

    Captures a ``jax.profiler`` trace of `iters` chained calls and accounts
    the device-side events per the rules in ``_trace_per_call_seconds``
    (top-level events only — nested module/op duplicates dedupe; per-name
    captured-count normalization).  This is ground truth where the
    wall-clock delta method (``device_time``) is an estimator: host/tunnel
    jitter cannot contaminate device timestamps.  Cross-checked against the
    delta method on the v5e chip (see BASELINE.md round-4 section).

    Returns None when no device-side events are captured (non-TPU platform
    or a profiler-less backend) — callers fall back to ``device_time``.
    """
    import glob
    import gzip
    import json
    import os
    import tempfile

    def run(k):
        v = x
        for _ in range(k):
            v = fn(v)
        return int(jnp.sum(v.ravel()[0]).astype(jnp.uint32) % jnp.uint32(97))

    run(1)  # warm / compile
    ctx = (
        tempfile.TemporaryDirectory()
        if log_dir is None
        else contextlib.nullcontext(log_dir)
    )
    with ctx as d:
        jax.profiler.start_trace(d)
        try:
            run(iters)
        finally:
            jax.profiler.stop_trace()
        traces = sorted(
            glob.glob(os.path.join(d, "plugins/profile/*/*.trace.json.gz"))
        )
        if not traces:
            return None
        with gzip.open(traces[-1]) as f:
            tr = json.load(f)
    return _trace_per_call_seconds(tr, iters=iters)


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
