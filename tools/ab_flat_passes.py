#!/usr/bin/env python
"""Pass-level breakdown of the flat four-step fwd kernel (VERDICT r4 item 7).

The flat fwd kernel at n=2^16 measures SLOWER (113.0 K NTT/s) than the
tiled kernel plus the HBM relayout tax it was built to remove (126.7 K
end-to-end, 158.1 K kernel-only — report_out/hw_r3/ab_flat.out).  This
tool isolates where the flat kernel's time goes, on hardware:

  * column-pass-only, row-pass-only, and twiddle-only flat kernels
    (same block shape, same tables) — which pass eats the deficit;
  * the SAME isolation for the tiled kernel's passes (axis-0 column
    stages on the (n1, n2) matrix vs the flat kernel's full-row lane
    rolls + full-width tables) — the per-pass head-to-head;
  * the tiled full-fuse kernel and the flat kernel as references.

The sum of the three isolated kernels overshoots the fused time by the
extra HBM round trips (two boundary passes each), so compare RATIOS of
passes, not absolute sums.  Writes one JSON line per measurement.

Reference analog: the per-loop II/occupancy table the FPGA report flow
emits (`/root/reference/Makefile:26,38-39`).
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from agilex_ntt_tpu.ops import flat_fuse, fourstep  # noqa: E402
from agilex_ntt_tpu.ops import stage_tables as st  # noqa: E402
from agilex_ntt_tpu.ops.fourstep import (  # noqa: E402
    _col_reader,
    _col_tabs_T,
    _full_specs,
)
from agilex_ntt_tpu.ops.modmul import shoup_mulmod_lazy_presplit  # noqa: E402
from agilex_ntt_tpu.ops.ntt_kernel import _pallas_roll, _row_reader  # noqa: E402
from agilex_ntt_tpu.ops.stage_math import fwd_stages, fwd_stages_axis0  # noqa: E402
from agilex_ntt_tpu.params import find_primes  # noqa: E402
from agilex_ntt_tpu.utils.profiling import (  # noqa: E402
    device_time,
    device_time_profiled,
)


def best(fn, x, iters):
    t = device_time_profiled(fn, x, iters=min(iters, 8))
    if t is not None:
        return t
    return min(device_time(fn, x, iters=iters) for _ in range(3))


def line(metric, value, unit, vs=None):
    print(json.dumps(
        {"metric": metric, "value": value, "unit": unit, "vs_baseline": vs},
    ), flush=True)


def _part_kernel(x_ref, cw, cp0, cp1, rw, rp0, rp1, tw, tp0, tp1, o_ref,
                 *, ts1, ts2, q, part):
    v = x_ref[:]
    if part in ("col", "col+tw"):
        v = fwd_stages(
            v, _row_reader(cw), _row_reader(cp0), _row_reader(cp1),
            ts=ts1, q=q, final_reduce=True, roll=_pallas_roll,
        )
    if part in ("tw", "col+tw"):
        v = shoup_mulmod_lazy_presplit(v, tw[:], tp0[:], tp1[:], q)
    if part == "row":
        v = fwd_stages(
            v, _row_reader(rw), _row_reader(rp0), _row_reader(rp1),
            ts=ts2, q=q, final_reduce=True, roll=_pallas_roll,
        )
    o_ref[:] = v


@functools.lru_cache(maxsize=32)
def _part_call(plan, part, br, interpret):
    n = plan.n
    cw, cp0, cp1 = flat_fuse._flat_col_tabs(
        st.fwd_stage_tables(plan.col), plan.n2
    )
    rw, rp0, rp1 = flat_fuse._flat_row_tabs(
        st.fwd_stage_tables(plan.row), plan.n1
    )
    ts1, ts2, _, _ = flat_fuse._flat_ts(plan)
    x_spec, ctab, rtab, stab = flat_fuse._specs(plan, br)
    kern = functools.partial(
        _part_kernel, ts1=ts1, ts2=ts2, q=plan.q, part=part
    )
    args = (
        jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(rw), jnp.asarray(rp0), jnp.asarray(rp1),
        jnp.asarray(plan.tw).reshape(1, n),
        jnp.asarray(plan.tp0).reshape(1, n),
        jnp.asarray(plan.tp1).reshape(1, n),
    )

    @jax.jit
    def call(x):
        return pl.pallas_call(
            kern,
            grid=(x.shape[0] // br,),
            in_specs=[x_spec, ctab, ctab, ctab, rtab, rtab, rtab,
                      stab, stab, stab],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x, *args)

    return call


def _tiled_part_kernel(x_ref, cw, cp0, cp1, rw, rp0, rp1, tw, tp0, tp1,
                       o_ref, *, ts1, ts2, q, part):
    v = x_ref[0]
    if part in ("col", "col+tw"):
        v = fwd_stages_axis0(
            v, _col_reader(cw), _col_reader(cp0), _col_reader(cp1),
            ts=ts1, q=q, final_reduce=True, roll=_pallas_roll,
        )
    if part in ("tw", "col+tw"):
        v = shoup_mulmod_lazy_presplit(v, tw[:], tp0[:], tp1[:], q)
    if part == "row":
        v = fwd_stages(
            v, _row_reader(rw), _row_reader(rp0), _row_reader(rp1),
            ts=ts2, q=q, final_reduce=True, roll=_pallas_roll,
        )
    o_ref[0] = v


@functools.lru_cache(maxsize=32)
def _tiled_part_call(plan, part, interpret):
    n1, n2 = plan.n1, plan.n2
    cw, cp0, cp1 = _col_tabs_T(st.fwd_stage_tables(plan.col))
    rtabs = st.fwd_stage_tables(plan.row)
    ts1 = tuple(n1 >> (s + 1) for s in range(n1.bit_length() - 1))
    ts2 = tuple(n2 >> (s + 1) for s in range(n2.bit_length() - 1))
    x_spec, ctab, rtab, stab = _full_specs(plan)
    kern = functools.partial(
        _tiled_part_kernel, ts1=ts1, ts2=ts2, q=plan.q, part=part
    )
    args = (
        jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(rtabs.w), jnp.asarray(rtabs.p0), jnp.asarray(rtabs.p1),
        jnp.asarray(plan.tw), jnp.asarray(plan.tp0), jnp.asarray(plan.tp1),
    )

    @jax.jit
    def call(x3):
        return pl.pallas_call(
            kern,
            grid=(x3.shape[0],),
            in_specs=[x_spec, ctab, ctab, ctab, rtab, rtab, rtab,
                      stab, stab, stab],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x3.shape, jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x3, *args)

    return call


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    on_tpu = jax.devices()[0].platform == "tpu"
    interpret = not on_tpu
    n, B, iters = (1024, 8, 2) if smoke else (65536, 512, 10)
    q = find_primes(n, 1)[0]
    plan = fourstep.make_plan(n, q)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, n), 0, q, dtype=jnp.uint32)

    # references
    t_flat = best(
        lambda v: flat_fuse.fwd_ntt_fourstep_flat(
            v, plan, interpret=interpret
        ), x, iters,
    )
    line(f"flat fused fwd (n=2^{n.bit_length() - 1}, B={B}, br=auto)",
         round(t_flat * 1e3, 4), "ms/call")
    x3 = x.reshape(B, plan.n1, plan.n2)
    t_kern = best(
        lambda v: fourstep.fwd_ntt_fourstep_tiled(
            v, plan, interpret=interpret
        ), x3, iters,
    )
    line("tiled fused fwd kernel-only", round(t_kern * 1e3, 4), "ms/call",
         round(t_flat / t_kern, 3))

    # isolated passes (each pays its own HBM in+out; compare ratios)
    for part in ("col", "tw", "col+tw", "row"):
        call = _part_call(plan, part, 8, interpret)
        t = best(call, x, iters)
        line(f"flat {part} pass only (br=8, own HBM round trip)",
             round(t * 1e3, 4), "ms/call", round(t / t_flat, 3))

    # the same isolation for the TILED kernel's passes (head-to-head)
    for part in ("col", "tw", "row"):
        call = _tiled_part_call(plan, part, interpret)
        t = best(call, x3, iters)
        line(f"tiled {part} pass only (own HBM round trip)",
             round(t * 1e3, 4), "ms/call", round(t / t_kern, 3))


if __name__ == "__main__":
    main()
