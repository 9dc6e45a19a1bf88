#!/usr/bin/env python
"""Measured per-op VPU issue costs (VERDICT round-2 item 2, round-4 item 4).

The roofline op census (`utils/opcount.py`) weights every ALU op at 1 issue
slot by assumption; BASELINE.md's residual-gap explanation ("rotates cost
~2.2 slots") was a conjecture.  This tool measures each op class directly:
a Pallas kernel runs a K-long dependent chain of one homogeneous op on a
VMEM-resident (256, 512) block (128 vregs -> plenty of independent
per-vreg chains, so throughput, not latency, is measured), at SEVERAL
chain lengths; the per-op cost is the least-squares slope of time vs K
(round 3's two-point subtraction let one noisy endpoint produce physically
impossible negative weights — report_out/opcost.json roll0:8 = -3.47):

    slots(op) = slope(t, K) / elems * 6.15e12

with 6.15e12 the v5e spec vector issue rate used by tools/roofline.py.
Ops that cannot chain alone (roll/shift/compare/select converge or fold)
ride an `add` carrier; the reported cost subtracts the measured add slope.

Fit hygiene (round-4 item 4): a weight is REJECTED — excluded from the
weights file, flagged in the output line — if the carrier-subtracted value
is negative (impossible: the carrier chain is a subset of the op chain) or
the fit explains too little variance (R^2 < 0.95, i.e. the point scatter
is jitter, not slope).  tools/roofline.py treats missing classes as
1 slot (conservative) and skips roll buckets that were rejected.

Chain constants arrive as runtime operands (not Python literals) so
neither XLA nor Mosaic can fold the chain.

Output: one JSON line per op plus a `weights` summary line; with
`--write`, also written to report_out/opcost.json for tools/roofline.py
to build a *measured* weighted ceiling.

Reference analog: the II/occupancy report the FPGA compiler emits per op
(/root/reference/Makefile:26,38-39) — here derived from hardware
measurement instead of compiler static analysis.
"""

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from agilex_ntt_tpu.utils.profiling import (  # noqa: E402
    device_time,
    device_time_profiled,
)

SPEC_ISSUE = 6.15e12  # v5e vector issue rate, see tools/roofline.py
_ON_TPU = jax.devices()[0].platform == "tpu"
ROWS, LANES = (256, 512) if _ON_TPU else (8, 128)
# chain lengths for the least-squares slope; >=5 points so one outlier
# cannot flip the sign (round-3's two-point form did exactly that)
KS = (32, 96, 160, 224, 288) if _ON_TPU else (2, 4)
R2_MIN = 0.95


def _chain_kernel(x_ref, c_ref, s_ref, o_ref, *, op, k):
    v = x_ref[...]
    cv = c_ref[...]
    sv = s_ref[0]
    w = cv + jnp.uint32(1)  # second runtime operand for select
    m = cv > jnp.uint32(0x7FFFFFFF)  # runtime mask vreg
    for _ in range(k):
        if op == "add":
            v = v + cv
        elif op == "sub":
            v = v - cv
        elif op == "mul":
            v = v * cv
        elif op == "and":
            v = v & cv
        elif op == "xor":
            v = v ^ cv
        elif op == "shift+add":
            v = (v >> sv) + cv
        elif op == "cmp+add":
            v = v + (v >= cv).astype(jnp.uint32)
        elif op == "select+add":
            v = jnp.where(m, v + cv, w)
        elif op.startswith("roll"):
            # "roll<axis>:<stride>+add"
            spec = op[4:].split("+")[0]
            axis, stride = (int(t) for t in spec.split(":"))
            v = pltpu.roll(v + cv, shift=stride, axis=axis)
        else:
            raise ValueError(op)
    o_ref[...] = v


@functools.lru_cache(maxsize=128)
def _build(op, k, interpret):
    kern = functools.partial(_chain_kernel, op=op, k=k)
    return jax.jit(
        lambda x, c, s: pl.pallas_call(
            kern,
            grid=(x.shape[0] // ROWS,),
            in_specs=[
                pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
                pl.BlockSpec((ROWS, LANES), lambda i: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(x, c, s)
    )


def measure(op, x, c, s, iters, interpret):
    """Least-squares slope of device time vs chain length K -> slots/op
    (plus the fit's R^2 and the raw per-K times)."""
    ts = {}
    for k in KS:
        fn = _build(op, k, interpret)
        call = lambda v: fn(v, c, s)
        t = device_time_profiled(call, x, iters=min(iters, 8))
        if t is None:
            t = min(device_time(call, x, iters=iters) for _ in range(3))
        ts[k] = t
    karr = np.asarray(KS, dtype=np.float64)
    tarr = np.asarray([ts[k] for k in KS])
    slope, intercept = np.polyfit(karr, tarr, 1)
    pred = slope * karr + intercept
    sst = float(((tarr - tarr.mean()) ** 2).sum())
    r2 = 1.0 - float(((tarr - pred) ** 2).sum()) / sst if sst > 0 else 1.0
    return slope / x.size * SPEC_ISSUE, r2, ts


def main():
    interpret = jax.devices()[0].platform != "tpu"
    batch = ROWS * (1 if interpret else 32)
    iters = 2 if interpret else 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 1 << 32, size=(batch, LANES), dtype=np.uint32)
    )
    c = jnp.asarray(
        rng.integers(1, 1 << 30, size=(ROWS, LANES), dtype=np.uint32)
    )
    s = jnp.asarray([1], dtype=jnp.uint32)

    ops = [
        "add", "sub", "mul", "and", "xor",
        "shift+add", "cmp+add", "select+add",
        "roll1:1+add", "roll1:8+add", "roll1:64+add", "roll1:256+add",
        "roll0:1+add", "roll0:8+add", "roll0:64+add",
    ]
    if interpret:  # wiring check only: tiny and meaningless timings
        ops = ["add", "mul", "roll1:8+add"]

    slots = {}  # accepted weights only (what roofline consumes)
    add_raw = None
    for op in ops:
        raw, r2, ts = measure(op, x, c, s, iters, interpret)
        if op == "add":
            if r2 < R2_MIN and not interpret:
                # the carrier itself is unfittable: nothing downstream is
                # trustworthy — bail rather than emit garbage weights
                print(json.dumps({
                    "metric": f"issue slots/op [add] ABORT: carrier fit "
                              f"R^2 {r2:.3f} < {R2_MIN}",
                    "value": round(raw, 3), "unit": "slots",
                    "vs_baseline": round(r2, 4),
                }), flush=True)
                return
            add_raw = raw
        cost = raw - add_raw if op.endswith("+add") else raw
        # Acceptance rules (round-4 item 4): a near-zero slope is a FREE op
        # (its line is flat, so R^2 is meaningless there); a significant
        # slope must both be positive and actually fit the points.
        reject = None
        if abs(cost) <= 0.25:
            cost = max(cost, 0.0)
        elif cost < 0:
            reject = "negative after carrier subtraction (impossible)"
        elif r2 < R2_MIN and not interpret:
            reject = f"fit R^2 {r2:.3f} < {R2_MIN} (jitter, not slope)"
        name = op.replace("+add", "")
        if reject is None:
            slots[name] = cost
        print(json.dumps({
            "metric": f"issue slots/op [{op}]"
                      + (f" REJECTED: {reject}" if reject else ""),
            "value": round(cost, 3), "unit": "slots",
            "vs_baseline": round(r2, 4),
        }), flush=True)

    print(json.dumps({"metric": "opcost weights (accepted fits only)",
                      "value": {
        k: round(v, 3) for k, v in slots.items()
    }, "unit": "slots", "vs_baseline": None}), flush=True)
    if "--write" in sys.argv and not interpret:
        os.makedirs("report_out", exist_ok=True)
        with open("report_out/opcost.json", "w") as f:
            json.dump({k: round(v, 4) for k, v in slots.items()}, f, indent=1)
        print("wrote report_out/opcost.json", file=sys.stderr)


if __name__ == "__main__":
    main()
