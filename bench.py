#!/usr/bin/env python
"""Headline benchmark: NTTs/sec/chip, n=4096, 30-bit SEAL-Embedded-style prime.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline derivation (the reference publishes no numbers — BASELINE.md):
the FPGA hot loop retires VEC=8 butterflies/cycle at II=1
(/root/reference/src/kernel/ntt.cpp:14-16,155-158), i.e.
log2(n) * n / (2*VEC) = 12 * 4096 / 16 = 3072 cycles per n=4096 frame; at the
~400 MHz Agilex clock that is ~130,208 NTTs/s per compute unit.

Timing: true on-device kernel time from a jax.profiler trace
(utils.profiling.device_time_profiled) — device timestamps are immune to
host/tunnel jitter.  Falls back to the wall-clock delta method (time k
chained calls minus one call, min-reduced separately) when no device trace
is available; the two agree within 1% on the v5e chip (fwd n=4096 b=8192 =
2.285 ms both ways, round 2).
"""

import json
import time

import jax
import jax.numpy as jnp

from agilex_ntt_tpu.params import find_primes, make_params
from agilex_ntt_tpu.ops import ntt_kernel, xla_ntt
from agilex_ntt_tpu.utils.profiling import device_time_profiled

N = 4096
# 400 MHz / (log2(4096) * 4096 / (2*VEC=16)) cycles = 130,208 frames/s per CU
BASELINE_NTTS_PER_SEC = 400e6 / (12 * 4096 / 16)


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    B = 8192 if on_tpu else 64
    iters = 40 if on_tpu else 3

    params = make_params(N, find_primes(N, 1)[0])
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, N), 0, params.q, dtype=jnp.uint32)

    if on_tpu:
        step = lambda v: ntt_kernel.fwd_ntt(v, params)
    else:
        step = lambda v: xla_ntt.fwd_ntt_xla(v, params)

    per_call = device_time_profiled(step, x, iters=min(iters, 10))
    if per_call is None:
        # no device-side trace events (CPU run): wall-clock delta method.
        def run(k):
            y = x
            for _ in range(k):
                y = step(y)
            # tiny readback forces full execution of the chain
            return int(jnp.sum(y[0]) % jnp.uint32(97))

        run(1)  # compile + warm
        # tunnel stalls are one-sided noise: min-reduce the baseline and the
        # chained measurement SEPARATELY before subtracting (subtracting one
        # stalled baseline sample from a clean chained sample would overstate
        # throughput, sometimes past the hardware ceiling)
        def sample(k, trials=3):
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                run(k)
                best = min(best, time.perf_counter() - t0)
            return best

        t_one = sample(1)
        t_many = sample(1 + iters)
        per_call = max((t_many - t_one) / iters, 1e-9)

    ntts_per_sec = B / per_call
    out = {
        "metric": f"NTTs/sec/chip (n={N}, 30-bit prime, batch={B}, fwd)",
        "value": round(ntts_per_sec, 1),
        "unit": "NTT/s",
        "vs_baseline": round(ntts_per_sec / BASELINE_NTTS_PER_SEC, 2),
    }
    print(json.dumps(out), flush=True)


def _run_supervised() -> int:
    """Re-exec the bench in a monitored child, retrying tunnel wedges.

    A process that dials the tunneled TPU near another TPU process's
    exit can hang FOREVER (threads parked, CPU frozen — CLAUDE.md); a
    fresh process minutes later works.  Since this file is the driver's
    one-shot contract, it supervises itself: each attempt gets a hard
    deadline, and an attempt that dies or stalls without output is
    retried after a settle delay.  Healthy runs are unaffected (the
    child prints the same single JSON line, passed through).
    """
    import os
    import select
    import subprocess
    import sys as _sys

    got_output = False
    for attempt in range(1, 4):
        if attempt > 1:
            print(f"# bench attempt {attempt - 1} produced no output; "
                  "settling 90s and retrying", file=_sys.stderr, flush=True)
            time.sleep(90)
        p = subprocess.Popen(
            [_sys.executable, "-u", os.path.abspath(__file__)],
            env={**os.environ, "NTT_BENCH_CHILD": "1"},
            stdout=subprocess.PIPE, stderr=_sys.stderr, text=True,
        )
        deadline = time.monotonic() + 900
        while True:
            ready, _, _ = select.select([p.stdout], [], [], 15)
            if ready:
                ln = p.stdout.readline()
                if ln:
                    got_output = True
                    print(ln, end="", flush=True)
                    continue
            if p.poll() is not None:
                break
            if time.monotonic() > deadline:
                p.kill()
                break
        p.wait()
        rest = p.stdout.read()
        if rest:
            got_output = True
            print(rest, end="", flush=True)
        if got_output:
            return p.returncode or 0
    return 1


if __name__ == "__main__":
    import os as _os
    import sys as _sys2

    if _os.environ.get("NTT_BENCH_CHILD") == "1":
        main()
    else:
        _sys2.exit(_run_supervised())
