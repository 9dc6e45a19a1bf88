"""Shared butterfly stage math, parameterized over the lane-rotate primitive.

Used by both the Pallas kernels (``ntt_kernel.py``, rotate = ``pltpu.roll``)
and the pure-XLA fallback path (``xla_ntt.py``, rotate = ``jnp.roll``) so the
two implementations cannot drift: they execute literally the same jnp ops.

Algorithm: positional Harvey lazy butterflies, HEXL stage order
(``for m = 1; m < n; m <<= 1`` with t = n/2 -> 1, mirroring
``/root/reference/src/kernel/ntt.cpp:146-501``).  Every lane position computes
its own butterfly output: position j with (j >> log2(t)) even is a 'u' slot
(out = tx + Q), odd is a 'v' slot (out = tx + 2q - Q); the partner value
arrives via a circular lane rotate.  The twiddle W and its Shoup precon are
identical at both slots of a pair, so Q is computed once per position with no
cross-lane reduction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .modmul import U32, cond_sub, mulhi_u32_presplit

RollFn = Callable[[jnp.ndarray, int, int], jnp.ndarray]
# roll(x, shift, axis) with jnp.roll semantics: y[j] = x[(j - shift) mod n]


def jnp_roll(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    return jnp.roll(x, shift, axis)


def _partner(x: jnp.ndarray, mask_u: jnp.ndarray, t: int, roll: RollFn) -> jnp.ndarray:
    """Each position's butterfly partner: x[j+t] at u slots, x[j-t] at v slots.

    Replaces the reference's five stride-specialized shuffle networks
    (ntt.cpp:207-289, 398-479) with two rotates + a select; rotated-in
    wraparound values land only at slots where they are never selected.
    """
    fwd = roll(x, -t, 1)  # brings x[j + t] to slot j
    bwd = roll(x, t, 1)   # brings x[j - t] to slot j
    return jnp.where(mask_u, fwd, bwd)


def fwd_stages(
    x: jnp.ndarray,
    w_rows,
    p0_rows,
    p1_rows,
    *,
    n: int,
    logn: int,
    q: int,
    roll: RollFn,
) -> jnp.ndarray:
    """All log2(n) forward stages. x: (rows, n) uint32 in [0, 4q).

    w_rows/p0_rows/p1_rows: callables s -> (1, n) stage table rows.
    Output fully reduced to [0, q) (final-stage correction, ntt.cpp:377-394).
    """
    two_q = U32(2 * q)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    for s in range(logn):
        t = n >> (s + 1)
        t_log = logn - 1 - s
        mask_u = ((lane >> t_log) & 1) == 0
        pu = _partner(x, mask_u, t, roll)
        tx = cond_sub(jnp.where(mask_u, x, pu), two_q)
        ay = jnp.where(mask_u, pu, x)
        hi = mulhi_u32_presplit(ay, p0_rows(s), p1_rows(s))
        Q = w_rows(s) * ay - hi * U32(q)
        x = jnp.where(mask_u, tx + Q, tx + two_q - Q)
        if s == logn - 1:
            x = cond_sub(cond_sub(x, two_q), U32(q))
    return x


def inv_stages(
    x: jnp.ndarray,
    w_rows,
    p0_rows,
    p1_rows,
    *,
    n: int,
    logn: int,
    q: int,
    scale: int,
    scale_precon: int,
    roll: RollFn,
) -> jnp.ndarray:
    """All log2(n) inverse (Gentleman-Sande) stages + fused final scaling.

    x: (rows, n) uint32 in [0, 2q); output fully reduced to [0, q).
    `scale` replaces n^-1 when a constant is fused (e.g. the Montgomery R of
    the pointwise product in polymul).
    """
    two_q = U32(2 * q)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    for s in range(logn):
        t = 1 << s
        mask_u = ((lane >> s) & 1) == 0
        pu = _partner(x, mask_u, t, roll)
        ssum = cond_sub(x + pu, two_q)
        d = jnp.where(mask_u, x - pu, pu - x) + two_q
        hi = mulhi_u32_presplit(d, p0_rows(s), p1_rows(s))
        Q = w_rows(s) * d - hi * U32(q)
        x = jnp.where(mask_u, ssum, Q)
    sp0 = U32(scale_precon & 0xFFFF)
    sp1 = U32(scale_precon >> 16)
    hi = mulhi_u32_presplit(x, sp0, sp1)
    x = U32(scale) * x - hi * U32(q)
    return cond_sub(x, U32(q))
