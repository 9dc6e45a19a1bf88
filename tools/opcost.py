#!/usr/bin/env python
"""Measured per-op VPU issue costs (VERDICT round-2 item 2).

The roofline op census (`utils/opcount.py`) weights every ALU op at 1 issue
slot by assumption; BASELINE.md's residual-gap explanation ("rotates cost
~2.2 slots") was a conjecture.  This tool measures each op class directly:
a Pallas kernel runs a K-long dependent chain of one homogeneous op on a
VMEM-resident (256, 512) block (128 vregs -> plenty of independent
per-vreg chains, so throughput, not latency, is measured), at two chain
lengths; the time difference isolates the per-op cost from fixed
pipeline/copy overhead:

    slots(op) = (t(K1) - t(K0)) / (elems * (K1 - K0)) * 6.15e12

with 6.15e12 the v5e spec vector issue rate used by tools/roofline.py.
Ops that cannot chain alone (roll/shift/compare/select converge or fold)
ride an `add` carrier; the reported cost subtracts the measured add.

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
K0, K1 = (32, 288) if _ON_TPU else (2, 4)


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
    ts = {}
    for k in (K0, K1):
        fn = _build(op, k, interpret)
        call = lambda v: fn(v, c, s)
        t = device_time_profiled(call, x, iters=min(iters, 8))
        if t is None:
            t = min(device_time(call, x, iters=iters) for _ in range(3))
        ts[k] = t
    per_op = (ts[K1] - ts[K0]) / (x.size * (K1 - K0))
    return per_op * SPEC_ISSUE, ts


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

    slots = {}
    for op in ops:
        raw, ts = measure(op, x, c, s, iters, interpret)
        cost = raw - slots.get("add", 0.0) if op.endswith("+add") else raw
        slots[op.replace("+add", "")] = cost
        print(json.dumps({
            "metric": f"issue slots/op [{op}]",
            "value": round(cost, 3), "unit": "slots",
            "vs_baseline": None,
        }), flush=True)

    print(json.dumps({"metric": "opcost weights", "value": {
        k: round(v, 3) for k, v in slots.items()
    }, "unit": "slots", "vs_baseline": None}), flush=True)
    if "--write" in sys.argv and not interpret:
        os.makedirs("report_out", exist_ok=True)
        with open("report_out/opcost.json", "w") as f:
            json.dump({k: round(v, 4) for k, v in slots.items()}, f, indent=1)
        print("wrote report_out/opcost.json", file=sys.stderr)


if __name__ == "__main__":
    main()
