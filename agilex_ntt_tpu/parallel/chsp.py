"""Channel x coefficient sharding: RNS four-step transforms on a
(ch, sp[, dp]) mesh — the L x large-n production shape.

Round 3 (VERDICT round-2 item 8).  Channel parallelism shards the prime-
channel axis with each channel's tables riding alongside (the expert-
parallel analog, ``mesh.ShardedRNSRing ch_axis``); coefficient sharding
splits one large transform over devices with two all-to-all retiles
(``fourstep_shard.py``).  Composing them needs both at once inside ONE
SPMD program: every device runs the same code, so per-channel constants
must arrive as *sharded array operands*, not static parameters.  The
channel-grid table-operand kernels (``ntt_kernel.fwd_ntt_rns_tables`` et
al.) provide exactly that — this module is ``fourstep_shard``'s body
rewritten over a local channel block:

    x (L, B, n) with spec P(ch, dp, sp)
      -> per-device (L/ch, B/dp, n/sp): n1/sp rows of each (n1, n2) matrix
      -> all-to-all over sp: rows -> columns retile
      -> size-n1 negacyclic column NTTs, channel on the kernel grid
      -> inter-pass scale (per-channel tables + moduli, sharded over ch/sp)
      -> all-to-all back, size-n2 cyclic row NTTs
    two ICI retiles per transform, zero channel-axis communication —
    the same comm volume as the single-channel four-step.

The column/row kernels are the Pallas channel-grid forms, so this path
requires the uniform Pallas configuration (every channel four-step Pallas,
shared (n1, n2)); CPU tests run it in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import ntt_kernel as K
from ..ops.fourstep import FourStepPlan
from ..ops.modmul import shoup_mulmod_lazy_presplit


def check_plans(plans: Tuple[FourStepPlan, ...], mesh: Mesh, ch_axis: str,
                sp_axis: str) -> None:
    n1, n2 = plans[0].n1, plans[0].n2
    if any((p.n1, p.n2) != (n1, n2) for p in plans):
        raise ValueError("all channels must share the (n1, n2) split")
    Psp = mesh.shape[sp_axis]
    if n1 % Psp or n2 % Psp:
        raise ValueError(
            f"four-step sharding needs P | n1 and P | n2: "
            f"P={Psp}, n1={n1}, n2={n2}"
        )
    if len(plans) % mesh.shape[ch_axis]:
        raise ValueError(
            f"the ch axis size ({mesh.shape[ch_axis]}) must divide "
            f"L={len(plans)} (whole channels per device)"
        )
    if n1 < K.MIN_KERNEL_N or n2 < K.MIN_KERNEL_N:
        raise ValueError(
            f"channel-grid pass kernels need n1, n2 >= {K.MIN_KERNEL_N}; "
            f"got ({n1}, {n2})"
        )


# -- stacked per-channel table bundles (numpy; cached per plan tuple) --------


@functools.lru_cache(maxsize=32)
def _fwd_bundle(plans: Tuple[FourStepPlan, ...]):
    qs, cw, cp0, cp1 = K.rns_fwd_tables(tuple(p.col for p in plans))
    _, rw, rp0, rp1 = K.rns_fwd_tables(tuple(p.row for p in plans))
    tw = np.stack([p.tw for p in plans])
    tp0 = np.stack([p.tp0 for p in plans])
    tp1 = np.stack([p.tp1 for p in plans])
    return qs, cw, cp0, cp1, tw, tp0, tp1, rw, rp0, rp1


@functools.lru_cache(maxsize=32)
def _inv_bundle(plans: Tuple[FourStepPlan, ...], scales: Tuple[int, ...]):
    """Row-pass inverse tables carry n2^-1; the column pass carries the
    remaining scale * n2 (so col_scale * row_scale = scale * n^-1 ... the
    same split as fourstep_shard._inv_body)."""
    qs, rw, rp0, rp1 = K.rns_inv_tables(
        tuple(p.row for p in plans),
        tuple(p.row.n_inv for p in plans),
    )
    _, cw, cp0, cp1 = K.rns_inv_tables(
        tuple(p.col for p in plans),
        tuple(s * p.n2 % p.q for p, s in zip(plans, scales)),
    )
    itw = np.stack([p.itw for p in plans])
    itp0 = np.stack([p.itp0 for p in plans])
    itp1 = np.stack([p.itp1 for p in plans])
    return qs, rw, rp0, rp1, itw, itp0, itp1, cw, cp0, cp1


# -- shard_map bodies ----------------------------------------------------------


def _fwd_body(
    x, qs, cw, cp0, cp1, tw, tp0, tp1, rw, rp0, rp1, *,
    sp_axis: str, n1: int, n2: int, Psp: int, col_ts, row_ts,
    block_rows, interpret,
):
    """x: (L_loc, B_loc, n/Psp) — n1/Psp whole rows of each channel's
    (n1, n2) matrix; tables: channel-local slices (see in_specs)."""
    Lc, b, _ = x.shape
    n1p, n2p = n1 // Psp, n2 // Psp
    xm = x.reshape(Lc, b, n1p, n2)
    # rows -> columns retile over ICI (channel axis untouched)
    xc = lax.all_to_all(xm, sp_axis, split_axis=3, concat_axis=2, tiled=True)
    cols = xc.transpose(0, 1, 3, 2).reshape(Lc, b * n2p, n1)
    yc = K.fwd_ntt_rns_tables(
        cols, qs, cw, cp0, cp1, ts=col_ts,
        block_rows=block_rows, interpret=interpret,
    )
    m1 = yc.reshape(Lc, b, n2p, n1).transpose(0, 1, 3, 2)  # (Lc, b, n1, n2p)
    qv = qs.reshape(Lc, 1, 1, 1)
    m2 = shoup_mulmod_lazy_presplit(
        m1, tw[:, None], tp0[:, None], tp1[:, None], qv
    )
    # columns -> rows retile
    xr = lax.all_to_all(m2, sp_axis, split_axis=2, concat_axis=3, tiled=True)
    rows = xr.reshape(Lc, b * n1p, n2)
    out = K.fwd_ntt_rns_tables(
        rows, qs, rw, rp0, rp1, ts=row_ts,
        block_rows=block_rows, interpret=interpret,
    )
    return out.reshape(Lc, b, n1p * n2)


def _inv_body(
    y, qs, rw, rp0, rp1, itw, itp0, itp1, cw, cp0, cp1, *,
    sp_axis: str, n1: int, n2: int, Psp: int, col_ts, row_ts,
    block_rows, interpret,
):
    Lc, b, _ = y.shape
    n1p, n2p = n1 // Psp, n2 // Psp
    rows = y.reshape(Lc, b * n1p, n2)
    r = K.inv_ntt_rns_tables(
        rows, qs, rw, rp0, rp1, ts=row_ts,
        block_rows=block_rows, interpret=interpret,
    )
    m = r.reshape(Lc, b, n1p, n2)
    mc = lax.all_to_all(m, sp_axis, split_axis=3, concat_axis=2, tiled=True)
    qv = qs.reshape(Lc, 1, 1, 1)
    mu = shoup_mulmod_lazy_presplit(
        mc, itw[:, None], itp0[:, None], itp1[:, None], qv
    )
    cols = mu.transpose(0, 1, 3, 2).reshape(Lc, b * n2p, n1)
    c = K.inv_ntt_rns_tables(
        cols, qs, cw, cp0, cp1, ts=col_ts,
        block_rows=block_rows, interpret=interpret,
    )
    cm = c.reshape(Lc, b, n2p, n1).transpose(0, 1, 3, 2)
    out = lax.all_to_all(cm, sp_axis, split_axis=2, concat_axis=3, tiled=True)
    return out.reshape(Lc, b, n1p * n2)


# -- public entry points -------------------------------------------------------


def _specs(ch_axis: str, sp_axis: str, dp_axis: Optional[str]):
    x = P(ch_axis, dp_axis, sp_axis)
    q = P(ch_axis, None)
    pass_tab = P(ch_axis, None, None)        # (L, log, n1|n2) whole per device
    scale_tab = P(ch_axis, None, sp_axis)    # (L, n1, n2) column slices
    return x, q, pass_tab, scale_tab


@functools.lru_cache(maxsize=64)
def _fwd_fn(plans, mesh, ch_axis, sp_axis, dp_axis, block_rows, interpret):
    n1, n2 = plans[0].n1, plans[0].n2
    col_ts = tuple(n1 >> (s + 1) for s in range(n1.bit_length() - 1))
    row_ts = tuple(n2 >> (s + 1) for s in range(n2.bit_length() - 1))
    x_spec, q_spec, t_spec, s_spec = _specs(ch_axis, sp_axis, dp_axis)
    body = functools.partial(
        _fwd_body, sp_axis=sp_axis, n1=n1, n2=n2, Psp=mesh.shape[sp_axis],
        col_ts=col_ts, row_ts=row_ts, block_rows=block_rows,
        interpret=interpret,
    )
    in_specs = (x_spec, q_spec, t_spec, t_spec, t_spec,
                s_spec, s_spec, s_spec, t_spec, t_spec, t_spec)
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=x_spec, check_vma=False,
    ))


@functools.lru_cache(maxsize=64)
def _inv_fn(plans, mesh, ch_axis, sp_axis, dp_axis, scales, block_rows,
            interpret):
    n1, n2 = plans[0].n1, plans[0].n2
    col_ts = tuple(1 << s for s in range(n1.bit_length() - 1))
    row_ts = tuple(1 << s for s in range(n2.bit_length() - 1))
    x_spec, q_spec, t_spec, s_spec = _specs(ch_axis, sp_axis, dp_axis)
    body = functools.partial(
        _inv_body, sp_axis=sp_axis, n1=n1, n2=n2, Psp=mesh.shape[sp_axis],
        col_ts=col_ts, row_ts=row_ts, block_rows=block_rows,
        interpret=interpret,
    )
    in_specs = (x_spec, q_spec, t_spec, t_spec, t_spec,
                s_spec, s_spec, s_spec, t_spec, t_spec, t_spec)
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=x_spec, check_vma=False,
    ))


def chsp_fwd(
    x: jnp.ndarray,
    plans: Tuple[FourStepPlan, ...],
    mesh: Mesh,
    *,
    ch_axis: str = "ch",
    sp_axis: str = "sp",
    dp_axis: Optional[str] = None,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward RNS four-step NTT, channels over ch_axis, coefficients over
    sp_axis, batch optionally over dp_axis.  x: (L, B, n) uint32 in [0, 4q_l)
    per channel; output [0, q_l), bit-identical per channel to the
    single-chip four-step transform."""
    check_plans(plans, mesh, ch_axis, sp_axis)
    fn = _fwd_fn(plans, mesh, ch_axis, sp_axis, dp_axis, block_rows,
                 interpret)
    qs, cw, cp0, cp1, tw, tp0, tp1, rw, rp0, rp1 = _fwd_bundle(plans)
    return fn(
        x, jnp.asarray(qs),
        jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(tw), jnp.asarray(tp0), jnp.asarray(tp1),
        jnp.asarray(rw), jnp.asarray(rp0), jnp.asarray(rp1),
    )


def chsp_inv(
    y: jnp.ndarray,
    plans: Tuple[FourStepPlan, ...],
    mesh: Mesh,
    *,
    ch_axis: str = "ch",
    sp_axis: str = "sp",
    dp_axis: Optional[str] = None,
    scales: Optional[Tuple[int, ...]] = None,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inverse (sharding as chsp_fwd).  y: (L, B, n) in [0, 2q_l); output
    [0, q_l).  scales: per-channel overall multipliers (default n^-1 mod
    q_l; polymul folds the Montgomery R in)."""
    check_plans(plans, mesh, ch_axis, sp_axis)
    if scales is None:
        scales = tuple(p.n_inv for p in plans)
    fn = _inv_fn(plans, mesh, ch_axis, sp_axis, dp_axis, scales, block_rows,
                 interpret)
    qs, rw, rp0, rp1, itw, itp0, itp1, cw, cp0, cp1 = _inv_bundle(
        plans, scales
    )
    return fn(
        y, jnp.asarray(qs),
        jnp.asarray(rw), jnp.asarray(rp0), jnp.asarray(rp1),
        jnp.asarray(itw), jnp.asarray(itp0), jnp.asarray(itp1),
        jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
    )
