"""MXU (systolic-array) formulation of the four-step NTT passes.

VERDICT round-2 item 1: the chip's dominant compute resource is 197
TFLOP/s of MXU (394 TOPS int8) — the entire perf story so far runs on the
VPU (6.15e12 vector ops/s).  The four-step column/row passes are literally
matmuls against fixed DFT matrices:

    column:  G[k1, c]  = sum_r  X[r, c] * psi1^((2*bitrev(k1)+1) r)
    row:     H[k1, k2] = sum_c  G'[k1, c] * omega2^(bitrev(k2) c)

i.e. G = D @ X and H = G' @ R^T with constant (n1, n1) / (n2, n2)
matrices.  The MXU has no modular integer unit, so the mod-q matmul is
synthesized limb-wise: operands split into four balanced signed 8-bit
digits (value = sum d_k 2^(8k), d_k in [-128, 127]), 16 int8 x int8 -> s32
``dot_general`` partial products (exact: |column sum| <= n1 * 2^14 <= 2^24
at n1 = 1024), then a VPU Horner pass reconstructs mod q.

Derived issue-rate accounting (BASELINE.md "MXU A/B"): per coefficient the
MXU executes 16*(n1 + n2) MACs at 197e12 MAC/s vs the VPU radix-2's ~28.5
ops/elem/stage * log2(n) at 6.15e12 — at n = 2^16 that is 41.6 ps vs 74 ps
of pure compute, BUT the digit extraction + Horner reconstruction add ~100
VPU ops/coeff, which is why this formulation must be *measured*, not
assumed (see tools/ab_mxu.py and the recorded A/B in BASELINE.md).

Everything here is plain jnp/XLA (``jax.lax.dot_general`` hits the MXU via
the s8 x s8 -> s32 path); outputs are bit-identical to the Pallas four-step
(both are exact mod-q transforms fully reduced to [0, q)).

Reference analog: the II=1 discipline of saturating the dominant hardware
resource (``/root/reference/src/kernel/ntt.cpp:155-158``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import bit_reverse
from .fourstep import FourStepPlan
from .modmul import U32, cond_sub, mulhi_u32, shoup_mulmod_lazy_presplit, u32

DIGITS = 4
_BASE = 256


def _balanced_digits_np(m: np.ndarray) -> np.ndarray:
    """(DIGITS, *m.shape) int8 balanced-signed base-256 digits of uint32/64
    values < 2**30 (host side, for the constant DFT matrices)."""
    v = m.astype(np.int64)
    out = np.zeros((DIGITS,) + m.shape, dtype=np.int8)
    for k in range(DIGITS):
        d = v & 0xFF
        adj = d >= 128
        d = d - 256 * adj
        v = (v >> 8) + adj
        out[k] = d.astype(np.int8)
    assert (v == 0).all(), "values exceed the digit range"
    return out


def _balanced_digits(x: jnp.ndarray) -> list:
    """Device-side balanced digits of uint32 values < 2**30 as int8.

    The bound matters: at values just below 2**31 the carry chain can push
    a fifth digit out the top (silent truncation), so callers reduce to
    [0, q) (q < 2**30) first — top digit then stays <= 64.
    """
    v = x.astype(jnp.int32)
    out = []
    for _ in range(DIGITS):
        d = v & 255
        adj = (d >= 128).astype(jnp.int32)
        d = d - 256 * adj
        v = (v >> 8) + adj
        out.append(d.astype(jnp.int8))
    return out


def _vandermonde(bases: np.ndarray, width: int, q: int) -> np.ndarray:
    """M[k, r] = bases[k]^r mod q, built with `width` vectorized uint64
    column multiplies instead of n^2 Python bignum pows (bases, M < 2**30
    so the products stay < 2**60)."""
    m = np.ones((len(bases), width), dtype=np.uint64)
    for r in range(1, width):
        m[:, r] = m[:, r - 1] * bases % np.uint64(q)
    return m


@functools.lru_cache(maxsize=32)
def _col_matrix_digits(plan: FourStepPlan):
    """D[k, r] = psi1^((2*bitrev(k)+1) r): the negacyclic column DFT
    (omega1^(bitrev(k) r) for cyclic plans)."""
    n1, q = plan.n1, plan.q
    l1 = n1.bit_length() - 1
    if hasattr(plan.col, "psi"):
        bases = [pow(plan.col.psi, 2 * bit_reverse(k, l1) + 1, q)
                 for k in range(n1)]
    else:  # cyclic plan: col pass uses omega1 (plan.col.omega)
        bases = [pow(plan.col.omega, bit_reverse(k, l1), q)
                 for k in range(n1)]
    return _balanced_digits_np(
        _vandermonde(np.array(bases, dtype=np.uint64), n1, q)
    )


@functools.lru_cache(maxsize=32)
def _row_matrix_digits(plan: FourStepPlan):
    """R[p, c] = omega2^(bitrev(p) c): the cyclic row DFT."""
    n2, q = plan.n2, plan.q
    l2 = n2.bit_length() - 1
    bases = [pow(plan.row.omega, bit_reverse(p, l2), q) for p in range(n2)]
    return _balanced_digits_np(
        _vandermonde(np.array(bases, dtype=np.uint64), n2, q)
    )


def _reconstruct_mod(partials, q: int) -> jnp.ndarray:
    """Horner-reassemble sum_s P_s * 256^s mod q from the 2*DIGITS-1 signed
    int32 digit-convolution partials, output in [0, q).

    Each step: u <- (256 * u mod q, Shoup lazy) + (P_s + OFF), then a
    Barrett reduction (mu = floor(2**32 / q), residue in [0, 3q)).  OFF is
    a fixed multiple of q > max |P_s| that makes the signed partial
    non-negative without changing it mod q.
    """
    off = ((1 << 27) // q + 1) * q  # > 4 * n1_max * 2^14 = 2^26
    mu = (1 << 32) // q
    pre256 = (256 << 32) // q
    p0, p1 = U32(pre256 & 0xFFFF), U32(pre256 >> 16)

    def barrett(v):
        m = mulhi_u32(v, U32(mu))
        r = v - m * U32(q)
        return cond_sub(cond_sub(r, 2 * q), q)

    offset = jnp.int32(off)  # off < 2**31: stays in int32 lanes
    u = barrett((partials[-1] + offset).astype(jnp.uint32))
    for s in range(len(partials) - 2, -1, -1):
        t = shoup_mulmod_lazy_presplit(u, U32(256), p0, p1, q)  # [0, 2q)
        v = t + (partials[s] + offset).astype(jnp.uint32)
        u = barrett(v)
    return u


def _digit_matmul(mat_digits: np.ndarray, x_digits: list, pattern: str,
                  q: int) -> jnp.ndarray:
    """Exact mod-q product of a constant digit-split matrix with digit-split
    data via 16 s8 MXU matmuls + Horner reconstruction."""
    nparts = 2 * DIGITS - 1
    partials = [None] * nparts
    for i in range(DIGITS):
        di = jnp.asarray(mat_digits[i])
        for j in range(DIGITS):
            p = jnp.einsum(
                pattern, di, x_digits[j],
                preferred_element_type=jnp.int32,
            )
            s = i + j
            partials[s] = p if partials[s] is None else partials[s] + p
    return _reconstruct_mod(partials, q)


@functools.partial(jax.jit, static_argnames=("plan",))
def fwd_ntt_fourstep_mxu(x: jnp.ndarray, plan: FourStepPlan) -> jnp.ndarray:
    """Forward four-step NTT of (batch, n) uint32 with BOTH passes on the
    MXU.  Input in [0, 4q); output [0, q), bit-identical to
    fourstep.fwd_ntt_fourstep (same exact transform, same final range)."""
    b = x.shape[0]
    n1, n2, q = plan.n1, plan.n2, plan.q
    # digit extraction needs [0, q) (see _balanced_digits): reduce the lazy
    # [0, 4q) input first — two conditional subtractions
    xt = cond_sub(cond_sub(x.reshape(b, n1, n2), 2 * q), q)
    # column pass: G = D @ X        (contract the row index r)
    g = _digit_matmul(
        _col_matrix_digits(plan), _balanced_digits(xt), "kr,brc->bkc", q
    )
    # inter-pass twiddle scale (positional Shoup, lazy [0, 2q) -> [0, q))
    m2 = shoup_mulmod_lazy_presplit(
        g,
        jnp.asarray(plan.tw)[None],
        jnp.asarray(plan.tp0)[None],
        jnp.asarray(plan.tp1)[None],
        q,
    )
    m2 = cond_sub(m2, q)
    # row pass: H = G' @ R^T        (contract the column index c)
    out = _digit_matmul(
        _row_matrix_digits(plan), _balanced_digits(m2), "pc,brc->brp", q
    )
    return out.reshape(b, plan.n)


@functools.partial(jax.jit, static_argnames=("plan",))
def fwd_col_pass_mxu(xt: jnp.ndarray, plan: FourStepPlan) -> jnp.ndarray:
    """Column pass only (G = D @ X on (B, n1, n2)), for pass-level A/B
    against the Pallas axis-0 column stages."""
    return _digit_matmul(
        _col_matrix_digits(plan), _balanced_digits(xt), "kr,brc->bkc", plan.q
    )
