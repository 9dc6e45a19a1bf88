"""Flat-layout fully-fused four-step kernels: no rank-2 <-> rank-3 relayout.

The fused four-step kernels in ``fourstep.py`` operate on the tiled
(B, n1, n2) layout, so every *flat-API* call pays a physical HBM relayout at
each boundary (~0.87 ms per in+out pair at 128 MB on v5e — the "four-step
API-boundary tax" measured in BASELINE.md: 126.9 K end-to-end vs 158 K
kernel-only fwd NTT/s at n = 2^16).  The tiled-domain API (``Ring.ntt_tiled``)
lets *chained* pipelines amortize the tax; this module avoids it for flat
callers by running both passes directly on the flat (rows, n) block.

Measured outcome (BASELINE.md rounds 3-5, n=2^16, B=512): the flat fwd
kernel runs SLOWER than tiled+relayout (113.0 K vs 126.8 K NTT/s — the
full-width stage tables and the 512-vreg live block cost more than the
relayout saves; pass-level breakdown in ``tools/ab_flat_passes.py``); inv
sits at parity within timing jitter; polymul has no feasible flat
configuration at n=2^16 at all (the VMEM guard below) and dispatches the
tiled fused kernel.  The per-op choice is therefore delegated to the
autotune cache (``utils/autotune.py``), not asserted here.

The trick is that the tiled layout is only an *addressing* convenience: with
flat index c = i * n2 + j,

  * the column transform (over i, fixed j) is ``stage_math.fwd_stages`` with
    every butterfly stride scaled by n2 — the stage's u/v mask bit
    log2(t * n2) of c IS bit log2(t) of i, and the lane rolls by t * n2 reach
    exactly the column partners (wrapped-in values land only at slots where
    that rolled copy is never selected, the same argument as the lane-packed
    n < 128 kernels);
  * the row transform (over j, fixed i) is the ordinary lane-direction chain:
    strides t < n2 never cross a segment boundary at a selected slot;
  * the inter-pass twiddle is one full-width positional mulmod.

So both passes reuse the shared stage chains verbatim; only the tables are
expanded to full width (column tables repeat each value n2 times, row tables
tile the size-n2 table n1 times — the VMEM cost is 3*(log n1 + log n2)*n
words, ~12 MB at n = 2^16, held resident across the batch grid).  Column
strides are multiples of n2 >= 128 lanes, i.e. whole-vreg renumbering —
cheaper than the tiled form's sub-8 sublane rotates.

Reference analog: the frame never leaving BLOCK_RAM between pipeline phases
(``/root/reference/src/kernel/ntt.cpp:90-101``) — here the polynomial never
changes HBM layout at all.

Compile-time note: the (block_rows, n) block holds block_rows * n / 1024
vregs; at n = 2^16 / rows = 8 that is 512 vregs x 16 stages, well under the
n = 2^20 tiled full-fuse kernel (1024 vregs x 20 stages) that already
compiles in minutes.  Larger n stays on the tiled path (`FLAT_FUSE_MAX_N`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stage_tables as st
from .fourstep import FourStepPlan
from .modmul import mont_mul_lazy, shoup_mulmod_lazy_presplit
from .ntt_kernel import _pallas_roll, _row_reader
from .stage_math import fwd_stages, inv_stages

# Beyond this the block instruction count (vregs x ops x stages) makes the
# single flat kernel compile-prohibitive; the tiled two-layout path wins.
FLAT_FUSE_MAX_N = 1 << 17

# -- byte-aware VMEM guard (VERDICT round-4 item 3) --------------------------
#
# v5e VMEM is 128 MiB.  The footprint of one flat op is
#
#   tables + window blocks + Mosaic stage-chain scratch,
#
# where tables = 3*(log n1 + log n2 + 1)*n words per direction (x2 for
# polymul, which carries both), windows = (inputs double-buffered + output
# double-buffered) blocks of block_rows*n words, and scratch scales with the
# block size (live vregs across the unrolled stage chains).  The scratch
# coefficients below are calibrated against the one hard datapoint on v5e:
# polymul at n=2^16 / block_rows=8 allocated 134.34 MiB (report_out/
# hw_r3/ab_flat.err) = 25.5 MiB tables + 12 MiB windows + ~48 blocks of
# temporaries (two forward chains' outputs stay live through the pointwise
# product plus the inverse chain); the single-transform kernels carry one
# chain, ~half the live set.  Coefficients are deliberately generous — the
# guard exists to turn an internal compiler OOM into a smaller block or a
# clean error, not to shave the last MiB.
_VMEM_BUDGET = 112 * 1024 * 1024  # leave pipeline headroom under 128 MiB
_SCRATCH_BLOCKS = {"fwd": 24, "inv": 24, "polymul": 50}
_WINDOW_BLOCKS = {"fwd": 4, "inv": 4, "polymul": 6}


def flat_vmem_bytes(plan: FourStepPlan, block_rows: int, op: str) -> int:
    """Model of the VMEM footprint (bytes) of one flat four-step kernel."""
    ln1 = plan.n1.bit_length() - 1
    ln2 = plan.n2.bit_length() - 1
    tab_words = 3 * (ln1 + ln2 + 1) * plan.n
    if op == "polymul":
        tab_words *= 2
    block_words = block_rows * plan.n
    blocks = _WINDOW_BLOCKS[op] + _SCRATCH_BLOCKS[op]
    return 4 * (tab_words + blocks * block_words)


def max_flat_block_rows(plan: FourStepPlan, op: str) -> Optional[int]:
    """8 if the modeled footprint fits the VMEM budget at block_rows=8,
    else None (caller should use the tiled kernels).

    8 is the MINIMUM legal block height on TPU for batches above 8 (the
    Pallas lowering requires the second-to-last block dim be a multiple
    of 8 or equal the array dim, and the flat API pads batches to a
    multiple of 8) — so there is no smaller fallback to probe."""
    if flat_vmem_bytes(plan, 8, op) <= _VMEM_BUDGET:
        return 8
    return None


def _fit_rows(plan: FourStepPlan, batch: int, block_rows: Optional[int],
              op: str, interpret: bool) -> int:
    """_pick_rows clamped by the VMEM model and TPU block-shape legality
    (rows a multiple of 8, or the whole batch); skipped in interpret mode,
    where there is no VMEM."""
    br = _pick_rows(batch, block_rows)
    if interpret:
        return br

    def ok(r):
        return (
            flat_vmem_bytes(plan, r, op) <= _VMEM_BUDGET
            and (r % 8 == 0 or r == batch)
            and batch % r == 0
        )

    while br and not ok(br):
        br -= 1
    if not br:
        # nothing legal at or below the request: snap UP to the smallest
        # legal block height (a sub-8 request on a padded batch was never
        # runnable anyway — pre-guard it died in the Pallas lowering)
        floor = batch if batch < 8 or batch % 8 else 8
        if ok(floor):
            return floor
        raise ValueError(
            f"flat four-step {op} at n={plan.n} has no legal block_rows "
            f"within the VMEM budget (modeled "
            f"{flat_vmem_bytes(plan, floor, op) >> 20} MiB at the minimum "
            f"legal block_rows={floor}, budget {_VMEM_BUDGET >> 20} MiB); "
            "use the tiled kernels (fourstep_kernel='tiled')"
        )
    return br


def _flat_col_tabs(tabs: st.StageTables, n2: int):
    """(log n1, n1) column stage tables -> full-width (log n1, n): the value
    at flat position c = i * n2 + j is the column table's value at i."""
    return (
        np.repeat(np.asarray(tabs.w), n2, axis=1),
        np.repeat(np.asarray(tabs.p0), n2, axis=1),
        np.repeat(np.asarray(tabs.p1), n2, axis=1),
    )


def _flat_row_tabs(tabs: st.StageTables, n1: int):
    """(log n2, n2) row stage tables -> full-width (log n2, n): the value at
    flat position c = i * n2 + j is the row table's value at j."""
    return (
        np.tile(np.asarray(tabs.w), (1, n1)),
        np.tile(np.asarray(tabs.p0), (1, n1)),
        np.tile(np.asarray(tabs.p1), (1, n1)),
    )


def _flat_ts(plan: FourStepPlan) -> Tuple[Tuple[int, ...], ...]:
    """(fwd col, fwd row, inv col, inv row) butterfly strides in FLAT units:
    column strides are the size-n1 strides scaled by n2."""
    n1, n2 = plan.n1, plan.n2
    ln1, ln2 = n1.bit_length() - 1, n2.bit_length() - 1
    return (
        tuple((n1 >> (s + 1)) * n2 for s in range(ln1)),
        tuple(n2 >> (s + 1) for s in range(ln2)),
        tuple((1 << s) * n2 for s in range(ln1)),
        tuple(1 << s for s in range(ln2)),
    )


def _pick_rows(batch: int, block_rows: Optional[int]) -> int:
    br = 8 if block_rows is None else block_rows
    br = min(br, batch)
    while batch % br:
        br -= 1
    return br


def _flat_fwd_kernel(x_ref, cw, cp0, cp1, rw, rp0, rp1, tw, tp0, tp1, o_ref,
                     *, ts1, ts2, q):
    v = fwd_stages(
        x_ref[:], _row_reader(cw), _row_reader(cp0), _row_reader(cp1),
        ts=ts1, q=q, final_reduce=True, roll=_pallas_roll,
    )
    v = shoup_mulmod_lazy_presplit(v, tw[:], tp0[:], tp1[:], q)
    o_ref[:] = fwd_stages(
        v, _row_reader(rw), _row_reader(rp0), _row_reader(rp1),
        ts=ts2, q=q, final_reduce=True, roll=_pallas_roll,
    )


def _flat_inv_kernel(x_ref, cw, cp0, cp1, rw, rp0, rp1, itw, itp0, itp1,
                     o_ref, *, ts1, ts2, q, row_scale, row_precon, col_scale,
                     col_precon):
    v = inv_stages(
        x_ref[:], _row_reader(rw), _row_reader(rp0), _row_reader(rp1),
        ts=ts2, q=q, scale=row_scale, scale_precon=row_precon,
        roll=_pallas_roll,
    )
    v = shoup_mulmod_lazy_presplit(v, itw[:], itp0[:], itp1[:], q)
    o_ref[:] = inv_stages(
        v, _row_reader(cw), _row_reader(cp0), _row_reader(cp1),
        ts=ts1, q=q, scale=col_scale, scale_precon=col_precon,
        roll=_pallas_roll,
    )


def _specs(plan: FourStepPlan, br: int):
    n = plan.n
    ln1 = plan.n1.bit_length() - 1
    ln2 = plan.n2.bit_length() - 1
    x_spec = pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ctab = pl.BlockSpec((ln1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rtab = pl.BlockSpec((ln2, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stab = pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return x_spec, ctab, rtab, stab


_CPARAMS = dict(
    dimension_semantics=("parallel",),
    vmem_limit_bytes=110 * 1024 * 1024,
)


@functools.partial(
    jax.jit, static_argnames=("plan", "block_rows", "interpret")
)
def fwd_ntt_fourstep_flat(
    x: jnp.ndarray,
    plan: FourStepPlan,
    *,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward four-step negacyclic NTT on the FLAT (B, n) layout, one
    kernel, no relayouts.  Bit-identical to ``fourstep.fwd_ntt_fourstep``."""
    b = x.shape[0]
    cw, cp0, cp1 = _flat_col_tabs(st.fwd_stage_tables(plan.col), plan.n2)
    rw, rp0, rp1 = _flat_row_tabs(st.fwd_stage_tables(plan.row), plan.n1)
    ts1, ts2, _, _ = _flat_ts(plan)
    br = _fit_rows(plan, b, block_rows, "fwd", interpret)
    x_spec, ctab, rtab, stab = _specs(plan, br)
    kern = functools.partial(_flat_fwd_kernel, ts1=ts1, ts2=ts2, q=plan.q)
    return pl.pallas_call(
        kern,
        grid=(b // br,),
        in_specs=[x_spec, ctab, ctab, ctab, rtab, rtab, rtab,
                  stab, stab, stab],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, plan.n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(**_CPARAMS),
        interpret=interpret,
    )(
        x, jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(rw), jnp.asarray(rp0), jnp.asarray(rp1),
        jnp.asarray(plan.tw).reshape(1, plan.n),
        jnp.asarray(plan.tp0).reshape(1, plan.n),
        jnp.asarray(plan.tp1).reshape(1, plan.n),
    )


@functools.partial(
    jax.jit, static_argnames=("plan", "scale", "block_rows", "interpret")
)
def inv_ntt_fourstep_flat(
    x: jnp.ndarray,
    plan: FourStepPlan,
    *,
    scale: Optional[int] = None,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inverse four-step NTT on the FLAT (B, n) layout, one kernel.
    Bit-identical to ``fourstep.inv_ntt_fourstep`` (same scale splitting:
    row-pass n2^-1, column-pass scale * n2)."""
    if scale is None:
        scale = plan.n_inv
    col_scale = scale * plan.n2 % plan.q
    row_scale = plan.row.n_inv
    b = x.shape[0]
    cw, cp0, cp1 = _flat_col_tabs(st.inv_stage_tables(plan.col), plan.n2)
    rw, rp0, rp1 = _flat_row_tabs(st.inv_stage_tables(plan.row), plan.n1)
    _, _, ts1, ts2 = _flat_ts(plan)
    br = _fit_rows(plan, b, block_rows, "inv", interpret)
    x_spec, ctab, rtab, stab = _specs(plan, br)
    kern = functools.partial(
        _flat_inv_kernel, ts1=ts1, ts2=ts2, q=plan.q,
        row_scale=row_scale, row_precon=(row_scale << 32) // plan.q,
        col_scale=col_scale, col_precon=(col_scale << 32) // plan.q,
    )
    return pl.pallas_call(
        kern,
        grid=(b // br,),
        in_specs=[x_spec, ctab, ctab, ctab, rtab, rtab, rtab,
                  stab, stab, stab],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, plan.n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(**_CPARAMS),
        interpret=interpret,
    )(
        x, jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(rw), jnp.asarray(rp0), jnp.asarray(rp1),
        jnp.asarray(plan.itw).reshape(1, plan.n),
        jnp.asarray(plan.itp0).reshape(1, plan.n),
        jnp.asarray(plan.itp1).reshape(1, plan.n),
    )


def _flat_polymul_kernel(
    a_ref, b_ref, fcw, fcp0, fcp1, frw, frp0, frp1, ftw, ftp0, ftp1,
    icw, icp0, icp1, irw, irp0, irp1, itw, itp0, itp1, o_ref,
    *, ts1f, ts2f, ts1i, ts2i, q, qinv_neg, row_scale, row_precon,
    col_scale, col_precon,
):
    def fwd4(v):
        v = fwd_stages(
            v, _row_reader(fcw), _row_reader(fcp0), _row_reader(fcp1),
            ts=ts1f, q=q, final_reduce=True, roll=_pallas_roll,
        )
        v = shoup_mulmod_lazy_presplit(v, ftw[:], ftp0[:], ftp1[:], q)
        return fwd_stages(
            v, _row_reader(frw), _row_reader(frp0), _row_reader(frp1),
            ts=ts2f, q=q, final_reduce=True, roll=_pallas_roll,
        )

    fa = fwd4(a_ref[:])
    fb = fwd4(b_ref[:])
    prod = mont_mul_lazy(fa, fb, q, qinv_neg)  # [0, 2q); R^-1 in col_scale
    v = inv_stages(
        prod, _row_reader(irw), _row_reader(irp0), _row_reader(irp1),
        ts=ts2i, q=q, scale=row_scale, scale_precon=row_precon,
        roll=_pallas_roll,
    )
    v = shoup_mulmod_lazy_presplit(v, itw[:], itp0[:], itp1[:], q)
    o_ref[:] = inv_stages(
        v, _row_reader(icw), _row_reader(icp0), _row_reader(icp1),
        ts=ts1i, q=q, scale=col_scale, scale_precon=col_precon,
        roll=_pallas_roll,
    )


@functools.partial(
    jax.jit,
    static_argnames=("plan", "scale", "qinv_neg", "block_rows", "interpret"),
)
def polymul_fourstep_flat(
    a: jnp.ndarray,
    b: jnp.ndarray,
    plan: FourStepPlan,
    *,
    scale: int,
    qinv_neg: int,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Negacyclic a*b mod (X^n + 1, q) as ONE kernel on the flat layout
    (both transforms + Montgomery pointwise + inverse; see
    ``fourstep.polymul_fourstep_fused`` for the scale contract).  Saves the
    three relayout pairs the tiled fused form pays at the flat boundary."""
    b_sz = a.shape[0]
    q = plan.q
    fc = _flat_col_tabs(st.fwd_stage_tables(plan.col), plan.n2)
    fr = _flat_row_tabs(st.fwd_stage_tables(plan.row), plan.n1)
    ic = _flat_col_tabs(st.inv_stage_tables(plan.col), plan.n2)
    ir = _flat_row_tabs(st.inv_stage_tables(plan.row), plan.n1)
    ts1f, ts2f, ts1i, ts2i = _flat_ts(plan)
    row_scale = plan.row.n_inv
    col_scale = scale * plan.n2 % q
    br = _fit_rows(plan, b_sz, block_rows, "polymul", interpret)
    x_spec, ctab, rtab, stab = _specs(plan, br)
    kern = functools.partial(
        _flat_polymul_kernel,
        ts1f=ts1f, ts2f=ts2f, ts1i=ts1i, ts2i=ts2i, q=q, qinv_neg=qinv_neg,
        row_scale=row_scale, row_precon=(row_scale << 32) // q,
        col_scale=col_scale, col_precon=(col_scale << 32) // q,
    )
    return pl.pallas_call(
        kern,
        grid=(b_sz // br,),
        in_specs=[x_spec, x_spec] + [ctab] * 3 + [rtab] * 3 + [stab] * 3
        + [ctab] * 3 + [rtab] * 3 + [stab] * 3,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b_sz, plan.n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(**_CPARAMS),
        interpret=interpret,
    )(
        a, b,
        jnp.asarray(fc[0]), jnp.asarray(fc[1]), jnp.asarray(fc[2]),
        jnp.asarray(fr[0]), jnp.asarray(fr[1]), jnp.asarray(fr[2]),
        jnp.asarray(plan.tw).reshape(1, plan.n),
        jnp.asarray(plan.tp0).reshape(1, plan.n),
        jnp.asarray(plan.tp1).reshape(1, plan.n),
        jnp.asarray(ic[0]), jnp.asarray(ic[1]), jnp.asarray(ic[2]),
        jnp.asarray(ir[0]), jnp.asarray(ir[1]), jnp.asarray(ir[2]),
        jnp.asarray(plan.itw).reshape(1, plan.n),
        jnp.asarray(plan.itp0).reshape(1, plan.n),
        jnp.asarray(plan.itp1).reshape(1, plan.n),
    )
