"""Shared butterfly stage math, parameterized over partner acquisition.

Used by three executors so their arithmetic cannot drift:
  * the Pallas kernels (``ntt_kernel.py``) — partner via ``pltpu.roll``;
  * the pure-XLA path (``xla_ntt.py``) — partner via ``jnp.roll``;
  * the stage-sharded multi-chip path (``parallel/stage_shard.py``) —
    partner shard via ``lax.ppermute`` over ICI for strides that cross the
    shard boundary, rolls for local strides.

Algorithm: positional Harvey lazy butterflies, HEXL stage order
(``for m = 1; m < n; m <<= 1`` with t = n/2 -> 1, mirroring
``/root/reference/src/kernel/ntt.cpp:146-501``).  Every position computes its
own butterfly output: position j with (j >> log2(t)) even is a 'u' slot
(out = tx + Q), odd a 'v' slot (out = tx + 2q - Q).  The twiddle W and its
Shoup precon are identical at both slots of a pair, so Q is computed once per
position with no cross-lane reduction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .modmul import U32, cond_sub, mulhi_u32_presplit, u32


def _q2(q):
    """(q, 2q) as uint32 values.  q may be a Python int (single-modulus
    kernels: becomes a compile-time constant) or a traced uint32 scalar
    (the multi-prime RNS kernel reads it from SMEM per grid channel)."""
    qv = u32(q)
    return qv, qv + qv

RollFn = Callable[[jnp.ndarray, int, int], jnp.ndarray]
# roll(x, shift, axis) with jnp.roll semantics: y[j] = x[(j - shift) mod n]


def jnp_roll(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    return jnp.roll(x, shift, axis)


def partner_via_roll(
    x: jnp.ndarray, mask_u: jnp.ndarray, t: int, roll: RollFn
) -> jnp.ndarray:
    """Each position's butterfly partner: x[j+t] at u slots, x[j-t] at v slots.

    Replaces the reference's five stride-specialized shuffle networks
    (ntt.cpp:207-289, 398-479) with two rotates + a select; rotated-in
    wraparound values land only at slots where they are never selected.

    The stage chains below no longer call this: they consume the two rolled
    copies directly (each is only read at the slots where it equals the
    partner), which saves the select.  Kept for tests/diagnostics.
    """
    fwd = roll(x, -t, 1)  # brings x[j + t] to slot j
    bwd = roll(x, t, 1)   # brings x[j - t] to slot j
    return jnp.where(mask_u, fwd, bwd)


# Butterfly strides that are a multiple of one 128-wide lane tile can be
# split into u/v halves with tile-aligned reshapes — each butterfly is then
# computed once (not once per slot), halving the arithmetic for those stages.
# Measured on TPU v5e this LOSES to the redundant positional form (2.16 vs
# 2.97 M NTT/s at n=4096): the interleaving stack/reshape costs more in
# Mosaic relayout traffic than the saved multiplies — the VPU is compute-rich
# and layout-change-poor.  Kept behind use_split for future hardware.
SPLIT_MIN_T = 128


def fwd_stage_step_split(x, w, p0, p1, *, t: int, q: int, last: bool):
    """One forward stage for lane-tile-aligned stride t (t % 128 == 0).

    x: (R, width) with width % (2t) == 0; w/p0/p1: (1, width) positional
    tables (values are identical at the u and v slots of a pair, so the
    v-slot slice serves both outputs).
    """
    R, width = x.shape
    g = width // (2 * t)
    two_q = U32(2 * q)
    x4 = x.reshape(R, g, 2, t)
    u = x4[:, :, 0, :]
    v = x4[:, :, 1, :]
    w4 = w.reshape(1, g, 2, t)[:, :, 1, :]
    p04 = p0.reshape(1, g, 2, t)[:, :, 1, :]
    p14 = p1.reshape(1, g, 2, t)[:, :, 1, :]
    tx = cond_sub(u, two_q)
    hi = mulhi_u32_presplit(v, p04, p14)
    Q = w4 * v - hi * U32(q)
    un = tx + Q
    vn = tx + two_q - Q
    if last:
        un = cond_sub(cond_sub(un, two_q), U32(q))
        vn = cond_sub(cond_sub(vn, two_q), U32(q))
    return jnp.stack([un, vn], axis=2).reshape(R, width)


def inv_stage_step_split(x, w, p0, p1, *, t: int, q: int):
    """One inverse (GS) stage for lane-tile-aligned stride t."""
    R, width = x.shape
    g = width // (2 * t)
    two_q = U32(2 * q)
    x4 = x.reshape(R, g, 2, t)
    u = x4[:, :, 0, :]
    v = x4[:, :, 1, :]
    w4 = w.reshape(1, g, 2, t)[:, :, 1, :]
    p04 = p0.reshape(1, g, 2, t)[:, :, 1, :]
    p14 = p1.reshape(1, g, 2, t)[:, :, 1, :]
    ssum = cond_sub(u + v, two_q)
    d = u - v + two_q
    hi = mulhi_u32_presplit(d, p04, p14)
    Q = w4 * d - hi * U32(q)
    return jnp.stack([ssum, Q], axis=2).reshape(R, width)


def fwd_stage_step(x, partner, mask_u, w, p0, p1, *, q: int, last: bool):
    """One forward (Cooley-Tukey) stage given this position's partner value.

    x, partner: uint32 in [0, 4q).  w/p0/p1: positional twiddle + pre-split
    Shoup precon (identical at both slots of a pair).  Returns values in
    [0, 4q), or [0, q) when `last` (final correction, ntt.cpp:377-394).
    Used by the cross-device stages (parallel/stage_shard.py), where the
    partner arrives as one ppermuted shard; the local chains use
    ``fwd_stage_step_rolls``.
    """
    qv, two_q = _q2(q)
    tx = cond_sub(jnp.where(mask_u, x, partner), two_q)
    ay = jnp.where(mask_u, partner, x)
    hi = mulhi_u32_presplit(ay, p0, p1)
    Q = w * ay - hi * qv
    out = jnp.where(mask_u, tx + Q, tx + two_q - Q)
    if last:
        out = cond_sub(cond_sub(out, two_q), qv)
    return out


def fwd_stage_step_rolls(x, fwd, bwd, mask_u, w, p0, p1, *, q: int, last: bool):
    """Forward stage consuming the two rolled copies directly.

    fwd[j] = x[j+t], bwd[j] = x[j-t].  The pair's u-value at slot j is x (u
    slots) / bwd (v slots); its v-value is fwd (u slots) / x (v slots) — so
    selecting between x and ONE rolled copy yields each operand and the
    explicit partner select of ``partner_via_roll`` is redundant (one fewer
    vselect per element per stage; measured on v5e, see BASELINE.md).
    """
    qv, two_q = _q2(q)
    tx = cond_sub(jnp.where(mask_u, x, bwd), two_q)   # the pair's u-value
    ay = jnp.where(mask_u, fwd, x)                     # the pair's v-value
    hi = mulhi_u32_presplit(ay, p0, p1)
    Q = w * ay - hi * qv
    out = jnp.where(mask_u, tx + Q, tx + two_q - Q)
    if last:
        out = cond_sub(cond_sub(out, two_q), qv)
    return out


def inv_stage_step(x, partner, mask_u, w, p0, p1, *, q: int):
    """One inverse (Gentleman-Sande) stage. x, partner in [0, 2q); out too.

    d is only consumed at v slots (u slots take ssum), so it is computed
    in the v orientation everywhere — no select; the u-slot garbage value
    is discarded by the final where.  Used by the cross-device stages; the
    local chains use ``inv_stage_step_rolls``.
    """
    qv, two_q = _q2(q)
    ssum = cond_sub(x + partner, two_q)
    d = partner - x + two_q  # v slots: u-value minus v-value
    hi = mulhi_u32_presplit(d, p0, p1)
    Q = w * d - hi * qv
    return jnp.where(mask_u, ssum, Q)


def inv_stage_step_rolls(x, fwd, bwd, mask_u, w, p0, p1, *, q: int):
    """Inverse stage consuming the two rolled copies directly (no partner
    select): ssum is only read at u slots where the partner is fwd; d only
    at v slots where the partner is bwd."""
    qv, two_q = _q2(q)
    ssum = cond_sub(x + fwd, two_q)
    d = bwd - x + two_q  # v slots: u-value minus v-value
    hi = mulhi_u32_presplit(d, p0, p1)
    Q = w * d - hi * qv
    return jnp.where(mask_u, ssum, Q)


def inv_stage_step_final(x, partner, mask_u, w, p0, p1, *, q: int):
    """Last GS stage with the n^-1 (or folded) scaling in its twiddle row.

    Expects tables from ``stage_tables.inv_stage_tables_scaled``: `scale` at
    u slots, `scale * w1` at v slots.  val (sum or diff) is < 4q < 2^32 and
    Shoup's bound holds for any uint32 operand, so one lazy mulmod + one
    conditional subtraction fully reduces to [0, q).
    """
    qv, two_q = _q2(q)
    val = jnp.where(mask_u, x + partner, partner - x + two_q)
    hi = mulhi_u32_presplit(val, p0, p1)
    return cond_sub(w * val - hi * qv, qv)


def inv_stage_step_final_rolls(x, fwd, bwd, mask_u, w, p0, p1, *, q: int):
    """``inv_stage_step_final`` on the two rolled copies directly."""
    qv, two_q = _q2(q)
    val = jnp.where(mask_u, x + fwd, bwd - x + two_q)
    hi = mulhi_u32_presplit(val, p0, p1)
    return cond_sub(w * val - hi * qv, qv)


def apply_scale(x, *, q: int, scale: int, scale_precon: int):
    """Fused final scaling (n^-1, possibly with folded constants), -> [0, q)."""
    sp0 = U32(scale_precon & 0xFFFF)
    sp1 = U32(scale_precon >> 16)
    hi = mulhi_u32_presplit(x, sp0, sp1)
    x = U32(scale) * x - hi * U32(q)
    return cond_sub(x, U32(q))


def fwd_stages(
    x: jnp.ndarray,
    w_rows,
    p0_rows,
    p1_rows,
    *,
    ts,
    q: int,
    final_reduce: bool,
    roll: RollFn,
    use_split: bool = False,
) -> jnp.ndarray:
    """Run forward stages with butterfly strides `ts` (a full transform passes
    ts = [n/2, n/4, ..., 1]; the stage-sharded path passes the local suffix).

    x: (rows, width) uint32 in [0, 4q); w_rows/p0_rows/p1_rows: callables
    s -> (1, width) stage table rows.  Output in [0, q) iff final_reduce.
    """
    # (1, width): the u/v mask is row-invariant, so compute it on one row
    # and let the selects broadcast (vs a full-tile iota: 3 ops/elem/stage)
    width = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), dimension=1)
    for s, t in enumerate(ts):
        last = final_reduce and s == len(ts) - 1
        if use_split and t >= SPLIT_MIN_T and width % (2 * t) == 0:
            x = fwd_stage_step_split(
                x, w_rows(s), p0_rows(s), p1_rows(s), t=t, q=q, last=last
            )
            continue
        t_log = t.bit_length() - 1
        mask_u = ((lane >> t_log) & 1) == 0
        fwd = roll(x, -t, 1)  # brings x[j + t] to slot j
        bwd = roll(x, t, 1)   # brings x[j - t] to slot j
        x = fwd_stage_step_rolls(
            x, fwd, bwd, mask_u, w_rows(s), p0_rows(s), p1_rows(s),
            q=q, last=last,
        )
    return x


def inv_stages(
    x: jnp.ndarray,
    w_rows,
    p0_rows,
    p1_rows,
    *,
    ts,
    q: int,
    scale=None,
    scale_precon=None,
    roll: RollFn,
    use_split: bool = False,
    scale_in_tables: bool = False,
) -> jnp.ndarray:
    """Run inverse stages with strides `ts` (full transform: [1, 2, ..., n/2];
    the stage-sharded path passes the local prefix), plus final scaling —
    either as a standalone pass (`scale`/`scale_precon`) or folded into the
    last stage's twiddle row (`scale_in_tables`, tables from
    ``inv_stage_tables_scaled``; saves one mulmod pass per element).

    x: (rows, width) uint32 in [0, 2q); output [0, q) if scaled, else [0, 2q).
    """
    width = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), dimension=1)
    for s, t in enumerate(ts):
        final = scale_in_tables and s == len(ts) - 1
        if not final and use_split and t >= SPLIT_MIN_T and width % (2 * t) == 0:
            x = inv_stage_step_split(
                x, w_rows(s), p0_rows(s), p1_rows(s), t=t, q=q
            )
            continue
        t_log = t.bit_length() - 1
        mask_u = ((lane >> t_log) & 1) == 0
        fwd = roll(x, -t, 1)
        bwd = roll(x, t, 1)
        step = inv_stage_step_final_rolls if final else inv_stage_step_rolls
        x = step(
            x, fwd, bwd, mask_u, w_rows(s), p0_rows(s), p1_rows(s), q=q
        )
    if scale is not None and not scale_in_tables:
        x = apply_scale(x, q=q, scale=scale, scale_precon=scale_precon)
    return x


def fwd_stages_axis0(
    x: jnp.ndarray,
    w_cols,
    p0_cols,
    p1_cols,
    *,
    ts,
    q: int,
    final_reduce: bool,
    roll: RollFn,
) -> jnp.ndarray:
    """Forward stages along axis 0 (the sublane direction) of an (n1, n2)
    tile: the four-step column transform without any transpose.

    The lane-direction chains (``fwd_stages``) need the transform dimension
    on lanes, which costs two on-chip transposes per four-step pass; on TPU
    the sublane direction rotates just as cheaply (vreg row permutes for
    t >= 8, intra-vreg sublane rotates below), so the column transform runs
    in place.  w_cols/p0_cols/p1_cols: callables s -> (n1, 1) stage table
    columns (broadcast along lanes).  Bit-identical to transposing,
    running ``fwd_stages``, and transposing back.
    """
    n1 = x.shape[0]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), dimension=0)
    for s, t in enumerate(ts):
        last = final_reduce and s == len(ts) - 1
        t_log = t.bit_length() - 1
        mask_u = ((rowi >> t_log) & 1) == 0
        fwd = roll(x, -t, 0)  # brings x[r + t] to row r
        bwd = roll(x, t, 0)
        x = fwd_stage_step_rolls(
            x, fwd, bwd, mask_u, w_cols(s), p0_cols(s), p1_cols(s),
            q=q, last=last,
        )
    return x


def inv_stages_axis0(
    x: jnp.ndarray,
    w_cols,
    p0_cols,
    p1_cols,
    *,
    ts,
    q: int,
    scale=None,
    scale_precon=None,
    roll: RollFn,
    scale_in_tables: bool = False,
) -> jnp.ndarray:
    """Inverse stages along axis 0 (see ``fwd_stages_axis0``)."""
    n1 = x.shape[0]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), dimension=0)
    for s, t in enumerate(ts):
        final = scale_in_tables and s == len(ts) - 1
        t_log = t.bit_length() - 1
        mask_u = ((rowi >> t_log) & 1) == 0
        fwd = roll(x, -t, 0)
        bwd = roll(x, t, 0)
        step = inv_stage_step_final_rolls if final else inv_stage_step_rolls
        x = step(
            x, fwd, bwd, mask_u, w_cols(s), p0_cols(s), p1_cols(s), q=q
        )
    if scale is not None and not scale_in_tables:
        x = apply_scale(x, q=q, scale=scale, scale_precon=scale_precon)
    return x
