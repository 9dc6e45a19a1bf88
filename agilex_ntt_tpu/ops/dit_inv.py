"""Descending-stride (DIT-form) inverse NTT — the round-2 VERDICT item 6 A/B.

Why this exists: the production inverse (Gentleman-Sande, ascending strides
t = 1..n/2, ``ntt_kernel.inv_ntt``) measures ~11% slower than the forward
kernel at equal op count, and round-2 probes traced the gap to the stride
*order* itself (forward math run ascending is equally slow).  The obvious fix
is an inverse that runs the forward kernel's descending order.  This module
implements the only such formulation and documents why no cheaper one exists.

Derivation (convention: ``X[k] = A(psi^(2*br(k)+1))``, golden.py:243-259,
mirroring the reference's HEXL order, /root/reference/src/kernel/ntt.cpp:146-501):

    x[j] = n^-1 * sum_k X[k] * psi^(-j*(2*br(k)+1))        (odd-exponent sum)
         = n^-1 * psi^-j * DFT_{w'}(X o br)[j]             (w' = psi^-2)

and the forward network F with tables from psi' = psi^-1 computes
``F(z)[m] = DFT_{w'}(z * psi'^k)[br(m)]``, so with ``z[k] = X[br(k)] * psi^k``:

    x[j] = n^-1 * psi^-j * F(z)[br(j)]

i.e. **two bit-reversal permutations are unavoidable**: conjugating F by
P_br to remove them (F o P_br = P_br o G) turns the descending-stride
network G' back into an ascending-stride one — which is exactly the
existing GS inverse.  Any permutation-free inverse of this transform runs
ascending strides; the descending form must pay 2 lane-bitrev gathers + 2
diagonal scale passes.  This module prices that trade so BASELINE.md can
record the A/B either way.

Implementation: the two scale passes are FUSED into the Pallas kernel (a
Shoup mulmod row before the first stage and after the last, the post row
pre-permuted so it applies before the output gather:
``n^-1 * psi^-br(m) = n^-1 * inv_roots[m]``); only the two bitrev gathers
run outside (XLA).  ``bitrev_permute`` offers both a direct gather and a
factored split-radix form (two short gathers + one transpose) — measured
on hardware by tools/ab_inv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import NTTParams, bit_reverse
from .modmul import U32, cond_sub, mulhi_u32_presplit
from .ntt_kernel import _pallas_roll, _pick_block_rows, _row_reader
from .stage_math import fwd_stages
from . import stage_tables as st


@functools.lru_cache(maxsize=32)
def _br_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    return np.array([bit_reverse(j, logn) for j in range(n)], dtype=np.int32)


def bitrev_permute(x: jnp.ndarray, *, factored: bool = False) -> jnp.ndarray:
    """Bit-reversal permutation along the last axis (an involution).

    factored=False: one XLA gather of width n.
    factored=True (even log n only): br_n = (br_sqrt x br_sqrt) o transpose —
    two width-sqrt(n) gathers on the split axes plus one (m, m) transpose.
    Which is cheaper on TPU is an empirical question; see BASELINE.md.
    """
    n = x.shape[-1]
    if not factored:
        return jnp.take(x, jnp.asarray(_br_perm(n)), axis=-1)
    logn = n.bit_length() - 1
    if logn % 2:
        raise ValueError("factored bitrev needs even log2(n)")
    m = 1 << (logn // 2)
    p = jnp.asarray(_br_perm(m))
    t = x.reshape(x.shape[:-1] + (m, m))
    t = jnp.take(jnp.take(t, p, axis=-1), p, axis=-2)
    t = jnp.swapaxes(t, -1, -2)
    return t.reshape(x.shape)


@functools.lru_cache(maxsize=32)
def _dit_tables(params: NTTParams):
    """Forward-order stage tables built from psi^-1, plus the two fused
    scale rows (value + pre-split Shoup precon halves each).

    Stage tables: the forward expansion (stage s: index m + i with m = 2^s,
    i = j >> (logn - s), stage_tables.py:56-62) over ``inv_roots32``
    (inv_roots[i] = psi^-br(i), params.py:237-238) — i.e. F with psi' tables.
    pre[k]  = psi^k           (applied to the already-permuted input)
    post[m] = n^-1 * psi^-br(m) = n^-1 * inv_roots[m]  (applied before the
              output gather, so it lands as n^-1 * psi^-j after it)
    """
    n, q, logn = params.n, params.q, params.log_n
    j = np.arange(n)
    idx = np.stack([(1 << s) + (j >> (logn - s)) for s in range(logn)], axis=0)
    tabs = st._expand(params.inv_roots32, params.inv_precon32, idx)

    psi = params.psi
    pre = np.array([pow(psi, int(k), q) for k in range(n)], dtype=np.uint64)
    post = (params.inv_roots.astype(object) * params.n_inv % q).astype(np.uint64)

    def row(vals):
        p = np.array([(int(v) << 32) // q for v in vals], dtype=np.uint64)
        return (
            vals.astype(np.uint32)[None, :],
            (p & 0xFFFF).astype(np.uint32)[None, :],
            (p >> 16).astype(np.uint32)[None, :],
        )

    return tabs, row(pre), row(post)


def _scale_row(x, w, p0, p1, q):
    """Positional Shoup mulmod by a (1, n) row; any uint32 operand -> [0, 2q)."""
    hi = mulhi_u32_presplit(x, p0, p1)
    return w * x - hi * U32(q)


def _dit_inv_kernel(
    x_ref, w_ref, p0_ref, p1_ref, s_ref, o_ref, *, ts, q
):
    # s_ref rows: 0-2 pre (w, p0, p1), 3-5 post
    x = _scale_row(
        x_ref[:], s_ref[0:1, :], s_ref[1:2, :], s_ref[2:3, :], q
    )  # [0, 2q)
    x = fwd_stages(
        x,
        _row_reader(w_ref),
        _row_reader(p0_ref),
        _row_reader(p1_ref),
        ts=ts,
        q=q,
        final_reduce=False,
        roll=_pallas_roll,
    )  # [0, 4q)
    x = _scale_row(x, s_ref[3:4, :], s_ref[4:5, :], s_ref[5:6, :], q)
    o_ref[:] = cond_sub(x, U32(q))


def _core(x, tabs, srows, *, ts, q, block_rows, interpret):
    kern = functools.partial(_dit_inv_kernel, ts=ts, q=q)
    batch, width = x.shape
    br = _pick_block_rows(batch, width, block_rows)
    tab_spec = lambda rows: pl.BlockSpec(
        (rows, width), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(batch // br,),
        in_specs=[
            pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            tab_spec(len(ts)),
            tab_spec(len(ts)),
            tab_spec(len(ts)),
            tab_spec(6),
        ],
        out_specs=pl.BlockSpec(
            (br, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, width), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, tabs[0], tabs[1], tabs[2], srows)


@functools.partial(
    jax.jit, static_argnames=("params", "block_rows", "interpret", "factored")
)
def inv_ntt_dit(
    x: jnp.ndarray,
    params: NTTParams,
    *,
    block_rows=None,
    interpret: bool = False,
    factored: bool = False,
) -> jnp.ndarray:
    """Inverse NTT via the descending-stride forward network.

    Accepts (batch, n) uint32 in [0, 2q) (same contract as inv_ntt);
    returns [0, q), bit-identical to ``golden.inv_ntt_u32``.
    """
    n, q = params.n, params.q
    tabs, pre, post = _dit_tables(params)
    w = jnp.asarray(tabs.w)
    p0 = jnp.asarray(tabs.p0)
    p1 = jnp.asarray(tabs.p1)
    srows = jnp.asarray(np.concatenate(list(pre) + list(post), axis=0))
    ts = [n >> (s + 1) for s in range(params.log_n)]
    z = bitrev_permute(x, factored=factored)
    y = _core(
        z, (w, p0, p1), srows, ts=tuple(ts), q=q,
        block_rows=block_rows, interpret=interpret,
    )
    return bitrev_permute(y, factored=factored)
