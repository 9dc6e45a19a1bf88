"""Pallas TPU kernels: forward / inverse negacyclic NTT (components C1, C3, C4).

TPU-native redesign of the reference's deeply pipelined FPGA compute kernel
(``fwd_ntt_kernel``, ``/root/reference/src/kernel/ntt.cpp:86-506``).  The
mapping is deliberately *not* a translation:

  * The reference vectorizes VEC=8 butterflies **within one polynomial** and
    therefore needs five hand-specialized shuffle networks for strides
    t < VEC (C4, ntt.cpp:207-289, 398-479).  Here the polynomial's n
    coefficients ride the 128-wide **lane** dimension and the batch rides the
    **sublane** dimension, so every stage is uniform row arithmetic; strided
    butterfly pairing becomes two lane-rotates + selects (``pltpu.roll``),
    the TPU register-permute analog of the FPGA shuffle network.
  * The banked BLOCK_RAM double-buffer with generation tags (C3,
    ntt.cpp:90-98, 321-344) exists to break RAW hazards in a hardware
    pipeline; under XLA's functional semantics each stage is a pure value
    computation, so the hazard (and the ``Xm`` tag machinery) vanishes.
  * Twiddle tables stream via FIFO pipes into kernel-local RAM in the
    reference (C5, ntt.cpp:122-141); here the positional stage tables are
    pallas_call operands resident in VMEM, re-used across the whole batch
    grid.
  * Frame streaming over depth-16 pipes (C6/C7/C9) becomes the pallas grid
    pipeline: BlockSpecs double-buffer (block_rows, n) batch tiles
    HBM -> VMEM -> HBM automatically.

Arithmetic is the Harvey lazy butterfly in uint32 words (q < 2**30, values in
[0, 4q)) — see ``stage_math.py`` (shared with the XLA fallback path) and
``modmul.py``.  Outputs are bit-identical to the uint64 golden model.
"""

from __future__ import annotations

import functools
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import NTTParams
from . import stage_tables as st
from .modmul import U32, cond_sub, mont_mul_lazy
from .stage_math import fwd_stages, inv_stages

DEFAULT_BLOCK_ROWS = 64

# Minimum transform size for the direct lane-rotate kernel: the polynomial
# must fill at least one 128-wide lane tile.  Smaller n (the reference's
# n=32 config, ntt.h:11-23) runs the SAME kernel via lane packing: k =
# PACK_WIDTH/n polynomials ride one row, with the positional stage tables
# tiled k times.  Rolls then wrap across polynomial boundaries, which is
# safe for the same reason single-polynomial wraparound is: a u slot's
# partner x[j+t] never crosses its segment (its stride-t bit is clear and
# 2t divides n), and wrapped values land only at slots that never read
# them.  Masks are periodic in n since 2t | n for every stage stride.
MIN_KERNEL_N = 128
PACK_WIDTH = 512


def _pack(x: jnp.ndarray, n: int):
    """(B, n) -> (ceil(B/k), k*n) with k = PACK_WIDTH // n polynomials per
    row (zero-padding the batch); returns (packed, true_batch, k)."""
    k = PACK_WIDTH // n
    b = x.shape[0]
    pad = (-b) % k
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x.reshape(-1, k * n), b, k


def _unpack(y: jnp.ndarray, n: int, b: int) -> jnp.ndarray:
    return y.reshape(-1, n)[:b]


def _tile_tabs(tabs, k: int):
    """Tile (log n, n) positional stage tables k times along lanes."""
    return (
        np.tile(np.asarray(tabs.w), (1, k)),
        np.tile(np.asarray(tabs.p0), (1, k)),
        np.tile(np.asarray(tabs.p1), (1, k)),
    )


def _pallas_roll(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """jnp.roll semantics on top of pltpu.roll (which wants shift >= 0)."""
    n = x.shape[axis]
    return pltpu.roll(x, shift=shift % n, axis=axis)


def _row_reader(ref):
    return lambda s: ref[s : s + 1, :]


def _fwd_kernel(x_ref, w_ref, p0_ref, p1_ref, o_ref, *, ts, q, final_reduce):
    o_ref[:] = fwd_stages(
        x_ref[:],
        _row_reader(w_ref),
        _row_reader(p0_ref),
        _row_reader(p1_ref),
        ts=ts,
        q=q,
        final_reduce=final_reduce,
        roll=_pallas_roll,
    )


def _inv_kernel(
    x_ref, w_ref, p0_ref, p1_ref, o_ref, *, ts, q, scale, scale_precon,
    scale_in_tables=False,
):
    o_ref[:] = inv_stages(
        x_ref[:],
        _row_reader(w_ref),
        _row_reader(p0_ref),
        _row_reader(p1_ref),
        ts=ts,
        q=q,
        scale=scale,
        scale_precon=scale_precon,
        roll=_pallas_roll,
        scale_in_tables=scale_in_tables,
    )


# Measured per-width block_rows optima (v5e, round 2, profiler-timed fwd
# sweep; non-monotonic in block bytes, so a lookup instead of a formula):
#   4096: 64->3.585, 128->3.645 M NTT/s        (128 wins)
#   8192: 64->1.595, 128->1.429, 256->1.515     (64 wins)
#  16384: 32->0.580, 64->0.648, 128->0.685      (128 wins)
#  32768: 16->0.252, 32->0.286, 64->0.310       (64 wins; 128 compile >23min)
_BEST_BLOCK_ROWS = {4096: 128, 8192: 64, 16384: 128, 32768: 64}


def _pick_block_rows(batch: int, width: int, requested: Optional[int]) -> int:
    explicit = requested is not None
    if not explicit:
        requested = _BEST_BLOCK_ROWS.get(width)
    if requested is None:
        # untuned widths: target ~2 MiB grid blocks — narrow widths
        # (four-step passes) need many rows per block or per-step DMA
        # overhead dominates (measured 1.4x at width 256); wide transforms
        # bottom out at 64 rows
        requested = min(512, max(DEFAULT_BLOCK_ROWS, (1 << 20) // (4 * width)))
    # snap to the largest LEGAL divisor of batch <= requested (halving
    # could collapse a non-dividing request like 48@batch=64 all the way
    # to 1-row blocks).  Legal means the Pallas TPU block-shape rule: the
    # sublane dim must be a multiple of 8 or equal the array dim — batch
    # 2072 once snapped to its divisor 74 and died in the Mosaic lowering
    # (round-5 suite, the BSGS matvec bake's 45x46-diagonal transform).
    b = min(requested, batch)
    while b and not (batch % b == 0 and (b % 8 == 0 or b == batch)):
        b -= 1
    if not b:
        # batch has no multiple-of-8 divisor <= requested (an unpadded
        # odd batch from a direct kernel call): one whole-array block is
        # always shape-legal (may cost VMEM, never a lowering error)
        b = batch
    if explicit and requested <= batch and b != requested:
        # silent snapping is fine for the auto-picked default and for the
        # benign batch < block_rows case (a ring tuned for big batches
        # called on a small one), but a user-supplied tuning value that
        # COULD have applied being quietly replaced hides the mis-tune
        # (e.g. 48@batch=64 -> 32)
        warnings.warn(
            f"block_rows={requested} does not divide batch={batch}; "
            f"using {b}",
            stacklevel=3,
        )
    return b


def _call(kernel, x, w, p0, p1, *, block_rows, interpret, num_stages):
    batch, width = x.shape
    block_rows = _pick_block_rows(batch, width, block_rows)
    grid = (batch // block_rows,)
    tab_spec = pl.BlockSpec(
        (num_stages, width), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            tab_spec,
            tab_spec,
            tab_spec,
        ],
        out_specs=pl.BlockSpec(
            (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, width), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # The unrolled stage chain keeps several block-sized temporaries
            # live; the default 16 MiB scoped-vmem budget is too tight for
            # large (block_rows x n) tiles.  v5e has 128 MiB of VMEM.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        # no cost_estimate: the hint measured ~3% SLOWER than letting the
        # compiler derive its own schedule (A/B on v5e)
        interpret=interpret,
    )(x, w, p0, p1)


def fwd_stages_pallas(
    x, w, p0, p1, *, ts, q, final_reduce, block_rows=None, interpret=False
):
    """Forward stages with strides `ts` as one Pallas kernel.

    x: (batch, width) uint32; w/p0/p1: (len(ts), width) positional tables.
    Used for full single-chip transforms and for the local-stage suffix of
    the stage-sharded multi-chip transform.
    """
    kern = functools.partial(_fwd_kernel, ts=ts, q=q, final_reduce=final_reduce)
    return _call(
        kern, x, w, p0, p1,
        block_rows=block_rows, interpret=interpret, num_stages=len(ts),
    )


def inv_stages_pallas(
    x, w, p0, p1, *, ts, q, scale=None, scale_precon=None,
    block_rows=None, interpret=False, scale_in_tables=False,
):
    """Inverse stages with strides `ts` (+ fused scaling if `scale` given)."""
    kern = functools.partial(
        _inv_kernel, ts=ts, q=q, scale=scale, scale_precon=scale_precon,
        scale_in_tables=scale_in_tables,
    )
    return _call(
        kern, x, w, p0, p1,
        block_rows=block_rows, interpret=interpret, num_stages=len(ts),
    )


def _polymul_kernel(
    a_ref, b_ref, fw, fp0, fp1, iw, ip0, ip1, o_ref, *,
    fwd_ts, inv_ts, q, qinv_neg,
):
    fa = fwd_stages(
        a_ref[:], _row_reader(fw), _row_reader(fp0), _row_reader(fp1),
        ts=fwd_ts, q=q, final_reduce=True, roll=_pallas_roll,
    )
    fb = fwd_stages(
        b_ref[:], _row_reader(fw), _row_reader(fp0), _row_reader(fp1),
        ts=fwd_ts, q=q, final_reduce=True, roll=_pallas_roll,
    )
    prod = mont_mul_lazy(fa, fb, q, qinv_neg)  # [0, 2q); R^-1 folds into scale
    o_ref[:] = inv_stages(
        prod, _row_reader(iw), _row_reader(ip0), _row_reader(ip1),
        ts=inv_ts, q=q, roll=_pallas_roll, scale_in_tables=True,
    )


@functools.partial(
    jax.jit, static_argnames=("params", "scale", "qinv_neg", "block_rows", "interpret")
)
def polymul_fused(
    a: jnp.ndarray,
    b: jnp.ndarray,
    params: NTTParams,
    *,
    scale: int,
    qinv_neg: int,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Negacyclic a*b mod (X^n + 1, q) as ONE Pallas kernel.

    Forward-transforms both operands, Montgomery-multiplies pointwise, and
    inverse-transforms — all on the same resident VMEM tile: two HBM reads
    and one write total, versus seven passes for the separate-kernel
    composition.  `scale` must already fold n^-1 and the Montgomery R
    (api.Ring.polymul_scale).  The TPU analog of the reference frame never
    leaving BLOCK_RAM between pipeline phases (ntt.cpp:90-101, 508-640).
    """
    ftabs = st.fwd_stage_tables(params)
    itabs = st.inv_stage_tables_scaled(params, scale)
    n, logn = params.n, params.log_n
    fwd_ts = tuple(n >> (s + 1) for s in range(logn))
    inv_ts = tuple(1 << s for s in range(logn))
    ftab3 = (ftabs.w, ftabs.p0, ftabs.p1)
    itab3 = (itabs.w, itabs.p0, itabs.p1)
    if n < MIN_KERNEL_N:
        # lane-packed: the pointwise product is elementwise, so packing is
        # transparent to the whole fused pipeline
        a, b_true, k = _pack(a, n)
        b, _, _ = _pack(b, n)
        ftab3 = _tile_tabs(ftabs, k)
        itab3 = _tile_tabs(itabs, k)
    else:
        b_true = None
    batch, width = a.shape
    br = _pick_block_rows(batch, width, block_rows)
    grid = (batch // br,)
    x_spec = pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(
        (logn, width), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _polymul_kernel, fwd_ts=fwd_ts, inv_ts=inv_ts, q=params.q,
        qinv_neg=qinv_neg,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, x_spec] + [tab_spec] * 6,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((batch, width), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        a, b,
        jnp.asarray(ftab3[0]), jnp.asarray(ftab3[1]), jnp.asarray(ftab3[2]),
        jnp.asarray(itab3[0]), jnp.asarray(itab3[1]), jnp.asarray(itab3[2]),
    )
    if b_true is not None:
        return _unpack(out, n, b_true)
    return out


# ---------------------------------------------------------------------------
# Multi-prime (RNS) single-kernel transforms: the prime channel rides the
# leading grid axis; each grid step reads its channel's stage tables (VMEM
# blocks indexed by l) and its modulus q from SMEM as a traced scalar.  One
# kernel launch covers all L channels — no per-channel dispatch, no
# jnp.stack copy of the results (measured 2.63 M channel-NTT/s stacked vs
# 3.59 M single-ring at L=3, n=4096 before this existed).
# ---------------------------------------------------------------------------


def _fwd_rns_kernel(q_ref, x_ref, w_ref, p0_ref, p1_ref, o_ref, *, ts):
    q = q_ref[pl.program_id(0), 0]
    w, p0, p1 = w_ref[0], p0_ref[0], p1_ref[0]
    row = lambda tab: (lambda s: tab[s : s + 1, :])
    o_ref[0] = fwd_stages(
        x_ref[0], row(w), row(p0), row(p1),
        ts=ts, q=q, final_reduce=True, roll=_pallas_roll,
    )


def _inv_rns_kernel(q_ref, x_ref, w_ref, p0_ref, p1_ref, o_ref, *, ts):
    q = q_ref[pl.program_id(0), 0]
    w, p0, p1 = w_ref[0], p0_ref[0], p1_ref[0]
    row = lambda tab: (lambda s: tab[s : s + 1, :])
    o_ref[0] = inv_stages(
        x_ref[0], row(w), row(p0), row(p1),
        ts=ts, q=q, roll=_pallas_roll, scale_in_tables=True,
    )


def _polymul_rns_kernel(
    q_ref, qinv_ref, a_ref, b_ref, fw, fp0, fp1, iw, ip0, ip1, o_ref, *,
    fwd_ts, inv_ts,
):
    q = q_ref[pl.program_id(0), 0]
    qinv_neg = qinv_ref[pl.program_id(0), 0]
    row = lambda tab: (lambda s: tab[s : s + 1, :])
    fwv, fp0v, fp1v = fw[0], fp0[0], fp1[0]
    fa = fwd_stages(
        a_ref[0], row(fwv), row(fp0v), row(fp1v),
        ts=fwd_ts, q=q, final_reduce=True, roll=_pallas_roll,
    )
    fb = fwd_stages(
        b_ref[0], row(fwv), row(fp0v), row(fp1v),
        ts=fwd_ts, q=q, final_reduce=True, roll=_pallas_roll,
    )
    prod = mont_mul_lazy(fa, fb, q, qinv_neg)
    o_ref[0] = inv_stages(
        prod, row(iw[0]), row(ip0[0]), row(ip1[0]),
        ts=inv_ts, q=q, roll=_pallas_roll, scale_in_tables=True,
    )


def _rns_stack(params_tuple, table_fn):
    return np.stack([np.asarray(a) for a in map(table_fn, params_tuple)])


def _rns_specs(L, batch, n, logn, block_rows):
    br = _pick_block_rows(batch, n, block_rows)
    grid = (L, batch // br)
    # whole (L, 1) scalar table per grid step (a (1, 1) SMEM block trips the
    # block divisibility check); kernels index it by pl.program_id(0)
    q_spec = pl.BlockSpec(
        (L, 1), lambda l, i: (0, 0), memory_space=pltpu.SMEM
    )
    x_spec = pl.BlockSpec(
        (1, br, n), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(
        (1, logn, n), lambda l, i: (l, 0, 0), memory_space=pltpu.VMEM
    )
    return grid, q_spec, x_spec, tab_spec


_RNS_COMPILER_PARAMS = dict(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def fwd_ntt_rns_tables(
    x: jnp.ndarray,
    qs: jnp.ndarray,
    w: jnp.ndarray,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    *,
    ts,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Table-operand core of fwd_ntt_rns: qs (L, 1) uint32 moduli and
    (L, log n, n) stage tables arrive as ARRAYS, so a channel-parallel
    shard_map can shard them over a mesh axis along with x (the RNS analog
    of expert parallelism; see parallel/mesh.ShardedRNSRing ch_axis)."""
    L, batch, n = x.shape
    logn = len(ts)
    grid, q_spec, x_spec, tab_spec = _rns_specs(L, batch, n, logn, block_rows)
    return pl.pallas_call(
        functools.partial(_fwd_rns_kernel, ts=ts),
        grid=grid,
        in_specs=[q_spec, x_spec, tab_spec, tab_spec, tab_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((L, batch, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(**_RNS_COMPILER_PARAMS),
        interpret=interpret,
    )(qs, x, w, p0, p1)


def rns_fwd_tables(params_tuple):
    """(qs, w, p0, p1) numpy bundle for fwd_ntt_rns_tables."""
    return (
        np.array([[p.q] for p in params_tuple], dtype=np.uint32),
        _rns_stack(params_tuple, lambda p: st.fwd_stage_tables(p).w),
        _rns_stack(params_tuple, lambda p: st.fwd_stage_tables(p).p0),
        _rns_stack(params_tuple, lambda p: st.fwd_stage_tables(p).p1),
    )


def rns_inv_tables(params_tuple, scales=None):
    """(qs, w, p0, p1) numpy bundle for inv_ntt_rns_tables (scaled)."""
    if scales is None:
        scales = tuple(p.n_inv for p in params_tuple)
    tabs = [
        st.inv_stage_tables_scaled(p, s)
        for p, s in zip(params_tuple, scales)
    ]
    return (
        np.array([[p.q] for p in params_tuple], dtype=np.uint32),
        np.stack([np.asarray(t.w) for t in tabs]),
        np.stack([np.asarray(t.p0) for t in tabs]),
        np.stack([np.asarray(t.p1) for t in tabs]),
    )


def inv_ntt_rns_tables(
    x: jnp.ndarray,
    qs: jnp.ndarray,
    w: jnp.ndarray,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    *,
    ts,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Table-operand core of inv_ntt_rns (tables already scale-folded)."""
    L, batch, n = x.shape
    logn = len(ts)
    grid, q_spec, x_spec, tab_spec = _rns_specs(L, batch, n, logn, block_rows)
    return pl.pallas_call(
        functools.partial(_inv_rns_kernel, ts=ts),
        grid=grid,
        in_specs=[q_spec, x_spec, tab_spec, tab_spec, tab_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((L, batch, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(**_RNS_COMPILER_PARAMS),
        interpret=interpret,
    )(qs, x, w, p0, p1)


@functools.partial(
    jax.jit, static_argnames=("params_tuple", "block_rows", "interpret")
)
def fwd_ntt_rns(
    x: jnp.ndarray,
    params_tuple,
    *,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward NTT of (L, batch, n) uint32 over L prime channels, one kernel.

    params_tuple: L NTTParams sharing n.  Output [0, q_l) per channel,
    bit-identical to running fwd_ntt per channel.
    """
    n = x.shape[2]
    logn = params_tuple[0].log_n
    ts = tuple(n >> (s + 1) for s in range(logn))
    qs, w, p0, p1 = rns_fwd_tables(params_tuple)
    return fwd_ntt_rns_tables(
        x, jnp.asarray(qs), jnp.asarray(w), jnp.asarray(p0), jnp.asarray(p1),
        ts=ts, block_rows=block_rows, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("params_tuple", "scales", "block_rows", "interpret"),
)
def inv_ntt_rns(
    x: jnp.ndarray,
    params_tuple,
    *,
    scales=None,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inverse NTT of (L, batch, n) over L prime channels, one kernel.

    scales: optional per-channel final scale overrides (tuple of L ints,
    each in [0, q_l)); defaults to n^-1 mod q_l.  Scaling rides each
    channel's last-stage twiddle row exactly like the single-ring kernel.
    """
    n = x.shape[2]
    logn = params_tuple[0].log_n
    ts = tuple(1 << s for s in range(logn))
    qs, w, p0, p1 = rns_inv_tables(params_tuple, scales)
    return inv_ntt_rns_tables(
        x, jnp.asarray(qs), jnp.asarray(w), jnp.asarray(p0), jnp.asarray(p1),
        ts=ts, block_rows=block_rows, interpret=interpret,
    )


def polymul_rns_tables(
    a: jnp.ndarray,
    b: jnp.ndarray,
    qs: jnp.ndarray,
    qinvs: jnp.ndarray,
    fw: jnp.ndarray,
    fp0: jnp.ndarray,
    fp1: jnp.ndarray,
    iw: jnp.ndarray,
    ip0: jnp.ndarray,
    ip1: jnp.ndarray,
    *,
    fwd_ts,
    inv_ts,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Table-operand core of polymul_rns_fused (see fwd_ntt_rns_tables):
    the channel-parallel shard_map shards tables/moduli alongside data."""
    L, batch, n = a.shape
    logn = len(fwd_ts)
    grid, q_spec, x_spec, tab_spec = _rns_specs(L, batch, n, logn, block_rows)
    return pl.pallas_call(
        functools.partial(_polymul_rns_kernel, fwd_ts=fwd_ts, inv_ts=inv_ts),
        grid=grid,
        in_specs=[q_spec, q_spec, x_spec, x_spec] + [tab_spec] * 6,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((L, batch, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(**_RNS_COMPILER_PARAMS),
        interpret=interpret,
    )(qs, qinvs, a, b, fw, fp0, fp1, iw, ip0, ip1)


@functools.partial(
    jax.jit,
    static_argnames=("params_tuple", "scales", "qinv_negs", "block_rows",
                     "interpret"),
)
def polymul_rns_fused(
    a: jnp.ndarray,
    b: jnp.ndarray,
    params_tuple,
    *,
    scales,
    qinv_negs,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Negacyclic polymul over L prime channels as ONE kernel.

    a, b: (L, batch, n); scales fold n^-1 and the Montgomery R per channel
    (api.Ring.polymul_scale); qinv_negs are the per-channel -q^-1 mod 2^32.
    """
    n = a.shape[2]
    logn = params_tuple[0].log_n
    fwd_ts = tuple(n >> (s + 1) for s in range(logn))
    inv_ts = tuple(1 << s for s in range(logn))
    qs, fw, fp0, fp1 = rns_fwd_tables(params_tuple)
    _, iw, ip0, ip1 = rns_inv_tables(params_tuple, scales)
    qinvs = np.array([[v] for v in qinv_negs], dtype=np.uint32)
    return polymul_rns_tables(
        a, b,
        jnp.asarray(qs), jnp.asarray(qinvs),
        jnp.asarray(fw), jnp.asarray(fp0), jnp.asarray(fp1),
        jnp.asarray(iw), jnp.asarray(ip0), jnp.asarray(ip1),
        fwd_ts=fwd_ts, inv_ts=inv_ts,
        block_rows=block_rows, interpret=interpret,
    )


# Routing cap for the single-kernel polydot forms: two (br, k, n) operand
# tiles sit resident per grid step, so the fused path only applies while
# one operand row (k*n*4 bytes) is small enough that even a few-row block
# fits VMEM comfortably; larger k*n streams through the composed
# per-transform path (which works in (bb*k, n) blocks).
POLYDOT_FUSE_WIDTH_BYTES = 1 << 19


def _pick_polydot_rows(batch: int, k: int, n: int,
                       requested: Optional[int]) -> int:
    """Block rows for (br, k, n) operand tiles: target ~4 MiB per operand
    block (measured: 64 rows = 3 MiB beats 32 rows = 1.5 MiB by 5% at k=3,
    n=4096; the generic _pick_block_rows formula floors at 64 rows, which
    at the largest fuse-eligible k*n widths would blow past VMEM — at the
    POLYDOT_FUSE_WIDTH_BYTES cap this still bounds blocks to 4 MiB x2
    operands x2 double-buffering = 16 MiB)."""
    explicit = requested is not None
    if not explicit:
        requested = max(1, (4 << 20) // (4 * k * n))
    b = min(requested, batch)
    while batch % b:
        b -= 1
    if explicit and requested <= batch and b != requested:
        # same warn-on-explicit-snap contract as _pick_block_rows
        warnings.warn(
            f"block_rows={requested} does not divide batch={batch}; "
            f"using {b}",
            stacklevel=3,
        )
    return b


def _polydot_rns_kernel(
    q_ref, qinv_ref, a_ref, b_ref, fw, fp0, fp1, iw, ip0, ip1, o_ref, *,
    k, fwd_ts, inv_ts,
):
    q = q_ref[pl.program_id(0), 0]
    qinv_neg = qinv_ref[pl.program_id(0), 0]
    row = lambda tab: (lambda s: tab[s : s + 1, :])
    fwv, fp0v, fp1v = fw[0], fp0[0], fp1[0]
    two_q = q + q
    acc = None
    for i in range(k):
        fa = fwd_stages(
            a_ref[0, :, i, :], row(fwv), row(fp0v), row(fp1v),
            ts=fwd_ts, q=q, final_reduce=True, roll=_pallas_roll,
        )
        fb = fwd_stages(
            b_ref[0, :, i, :], row(fwv), row(fp0v), row(fp1v),
            ts=fwd_ts, q=q, final_reduce=True, roll=_pallas_roll,
        )
        term = mont_mul_lazy(fa, fb, q, qinv_neg)
        acc = term if acc is None else cond_sub(acc + term, two_q)
    o_ref[0] = inv_stages(
        acc, row(iw[0]), row(ip0[0]), row(ip1[0]),
        ts=inv_ts, q=q, roll=_pallas_roll, scale_in_tables=True,
    )


def polydot_rns_tables(
    a: jnp.ndarray,
    b: jnp.ndarray,
    qs: jnp.ndarray,
    qinvs: jnp.ndarray,
    fw: jnp.ndarray,
    fp0: jnp.ndarray,
    fp1: jnp.ndarray,
    iw: jnp.ndarray,
    ip0: jnp.ndarray,
    ip1: jnp.ndarray,
    *,
    fwd_ts,
    inv_ts,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Table-operand core of polydot_rns_fused: a, b (L, batch, k, n) with
    (L, 1) moduli and (L, log n, n) stage tables as ARRAYS, so the
    channel-parallel shard_map can shard them over a mesh axis alongside
    the data (see fwd_ntt_rns_tables / parallel/mesh.ShardedRNSRing)."""
    L, batch, k, n = a.shape
    logn = len(fwd_ts)
    br = _pick_polydot_rows(batch, k, n, block_rows)
    grid = (L, batch // br)
    q_spec = pl.BlockSpec(
        (L, 1), lambda l, i: (0, 0), memory_space=pltpu.SMEM
    )
    x_spec = pl.BlockSpec(
        (1, br, k, n), lambda l, i: (l, i, 0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (1, br, n), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(
        (1, logn, n), lambda l, i: (l, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_polydot_rns_kernel, k=k, fwd_ts=fwd_ts,
                          inv_ts=inv_ts),
        grid=grid,
        in_specs=[q_spec, q_spec, x_spec, x_spec] + [tab_spec] * 6,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((L, batch, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(**_RNS_COMPILER_PARAMS),
        interpret=interpret,
    )(qs, qinvs, a, b, fw, fp0, fp1, iw, ip0, ip1)


@functools.partial(
    jax.jit,
    static_argnames=("params_tuple", "scales", "qinv_negs", "block_rows",
                     "interpret"),
)
def polydot_rns_fused(
    a: jnp.ndarray,
    b: jnp.ndarray,
    params_tuple,
    *,
    scales,
    qinv_negs,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inner product sum_i a_i * b_i over L prime channels as ONE kernel.

    a, b: (L, batch, k, n).  The channel rides the grid like the other RNS
    kernels; within a grid step the k-term accumulation happens on the
    resident tile (see polydot_fused).
    """
    n = a.shape[3]
    logn = params_tuple[0].log_n
    fwd_ts = tuple(n >> (s + 1) for s in range(logn))
    inv_ts = tuple(1 << s for s in range(logn))
    qs, fw, fp0, fp1 = rns_fwd_tables(params_tuple)
    _, iw, ip0, ip1 = rns_inv_tables(params_tuple, scales)
    qinvs = np.array([[v] for v in qinv_negs], dtype=np.uint32)
    return polydot_rns_tables(
        a, b,
        jnp.asarray(qs), jnp.asarray(qinvs),
        jnp.asarray(fw), jnp.asarray(fp0), jnp.asarray(fp1),
        jnp.asarray(iw), jnp.asarray(ip0), jnp.asarray(ip1),
        fwd_ts=fwd_ts, inv_ts=inv_ts,
        block_rows=block_rows, interpret=interpret,
    )


def _polydot_kernel(
    a_ref, b_ref, fw, fp0, fp1, iw, ip0, ip1, o_ref, *,
    k, fwd_ts, inv_ts, q, qinv_neg,
):
    two_q = U32(2 * q)
    acc = None
    for i in range(k):  # k is static; terms accumulate lazily in [0, 2q)
        fa = fwd_stages(
            a_ref[:, i, :], _row_reader(fw), _row_reader(fp0), _row_reader(fp1),
            ts=fwd_ts, q=q, final_reduce=True, roll=_pallas_roll,
        )
        fb = fwd_stages(
            b_ref[:, i, :], _row_reader(fw), _row_reader(fp0), _row_reader(fp1),
            ts=fwd_ts, q=q, final_reduce=True, roll=_pallas_roll,
        )
        term = mont_mul_lazy(fa, fb, q, qinv_neg)
        acc = term if acc is None else cond_sub(acc + term, two_q)
    o_ref[:] = inv_stages(
        acc, _row_reader(iw), _row_reader(ip0), _row_reader(ip1),
        ts=inv_ts, q=q, roll=_pallas_roll, scale_in_tables=True,
    )


@functools.partial(
    jax.jit, static_argnames=("params", "scale", "qinv_neg", "block_rows", "interpret")
)
def polydot_fused(
    a: jnp.ndarray,
    b: jnp.ndarray,
    params: NTTParams,
    *,
    scale: int,
    qinv_neg: int,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """sum_i a_i * b_i mod (X^n + 1, q) as ONE Pallas kernel.

    a, b: (batch, k, n) uint32 in [0, q).  All 2k forward transforms, the
    Montgomery pointwise products, the lazy accumulation, and the single
    scaled inverse run on the same resident VMEM tile: 2 HBM reads and one
    (k-times smaller) write total, versus 4k+3 passes for the composed
    form.  `scale` folds n^-1 and the Montgomery R (api.Ring.polymul_scale).
    Bit-identical to the composed Ring.polydot (same accumulation order).
    """
    batch, k, n = a.shape
    ftabs = st.fwd_stage_tables(params)
    itabs = st.inv_stage_tables_scaled(params, scale)
    logn = params.log_n
    fwd_ts = tuple(n >> (s + 1) for s in range(logn))
    inv_ts = tuple(1 << s for s in range(logn))
    br = _pick_polydot_rows(batch, k, n, block_rows)
    grid = (batch // br,)
    x_spec = pl.BlockSpec(
        (br, k, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(
        (logn, n), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _polydot_kernel, k=k, fwd_ts=fwd_ts, inv_ts=inv_ts, q=params.q,
        qinv_neg=qinv_neg,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, x_spec] + [tab_spec] * 6,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        a, b,
        jnp.asarray(ftabs.w), jnp.asarray(ftabs.p0), jnp.asarray(ftabs.p1),
        jnp.asarray(itabs.w), jnp.asarray(itabs.p0), jnp.asarray(itabs.p1),
    )


@functools.partial(jax.jit, static_argnames=("params", "block_rows", "interpret"))
def fwd_ntt(
    x: jnp.ndarray,
    params: NTTParams,
    *,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward negacyclic NTT of a (batch, n) uint32 array.

    Input coefficients must be in [0, 4q); output is fully reduced to [0, q)
    in the HEXL evaluation order out[k] = A(psi^(2*bitrev(k)+1)).
    n < 128 runs lane-packed (see PACK_WIDTH).
    """
    tabs = st.fwd_stage_tables(params)
    ts = tuple(params.n >> (s + 1) for s in range(params.log_n))
    if params.n < MIN_KERNEL_N:
        xp, b, k = _pack(x, params.n)
        w, p0, p1 = _tile_tabs(tabs, k)
        y = fwd_stages_pallas(
            xp, w, p0, p1, ts=ts, q=params.q, final_reduce=True,
            block_rows=block_rows, interpret=interpret,
        )
        return _unpack(y, params.n, b)
    return fwd_stages_pallas(
        x, tabs.w, tabs.p0, tabs.p1,
        ts=ts, q=params.q, final_reduce=True,
        block_rows=block_rows, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("params", "scale", "block_rows", "interpret")
)
def inv_ntt(
    x: jnp.ndarray,
    params: NTTParams,
    *,
    scale: Optional[int] = None,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inverse negacyclic NTT of a (batch, n) uint32 array.

    Input may be lazy in [0, 2q); output is reduced to [0, q).  `scale`
    overrides the final n^-1 multiplication (e.g. n^-1 * 2^32 mod q to absorb
    a Montgomery factor from the pointwise product); it must be in [0, q).
    """
    if scale is None:
        scale = params.n_inv
    # scaling rides the last stage's twiddle row: no standalone scale pass
    tabs = st.inv_stage_tables_scaled(params, scale)
    ts = tuple(1 << s for s in range(params.log_n))
    if params.n < MIN_KERNEL_N:
        xp, b, k = _pack(x, params.n)
        w, p0, p1 = _tile_tabs(tabs, k)
        y = inv_stages_pallas(
            xp, w, p0, p1, ts=ts, q=params.q, scale=None, scale_precon=None,
            scale_in_tables=True, block_rows=block_rows, interpret=interpret,
        )
        return _unpack(y, params.n, b)
    return inv_stages_pallas(
        x, tabs.w, tabs.p0, tabs.p1,
        ts=ts, q=params.q, scale=None, scale_precon=None,
        scale_in_tables=True,
        block_rows=block_rows, interpret=interpret,
    )
