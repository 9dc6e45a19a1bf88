"""Host-side per-stage positional twiddle tables for the TPU kernels.

The reference streams two N-entry tables into kernel-local RAM and indexes
them ``local_roots[m + i]`` per butterfly group (component C5,
``/root/reference/src/kernel/ntt.cpp:100-101, 122-141, 298-300``).  On TPU the
analogous layout is *positional*: for each of the log2(n) stages we expand the
twiddle (and its pre-split Shoup precon halves) to one value per coefficient
position, giving dense (log_n, n) uint32 arrays that live in VMEM and broadcast
along the batch (sublane) dimension for free.  Total footprint is
3 * 4 * n * log2(n) bytes per direction (~0.6 MB at n=4096) — the VMEM analog
of the reference's BLOCK_RAM twiddle banks.

Position j in forward stage s (m = 2^s, t = n >> (s+1)) belongs to butterfly
group i = j >> (log2(n) - s), using table index m + i — exactly the reference's
indexing (ntt.cpp:298-300) with the group id computed per position instead of
per loop iteration.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..params import NTTParams


@dataclasses.dataclass(frozen=True)
class StageTables:
    """Positional per-stage twiddles: each array has shape (log_n, n), uint32.

    w:   twiddle value at (stage, position)
    p0:  low 16 bits of the Shoup precon floor(w * 2**32 / q)
    p1:  high 16 bits of the precon
    """

    w: np.ndarray
    p0: np.ndarray
    p1: np.ndarray


def _expand(roots32: np.ndarray, precon32: np.ndarray, idx: np.ndarray) -> StageTables:
    w = roots32[idx]
    p = precon32[idx]
    return StageTables(
        w=np.ascontiguousarray(w, dtype=np.uint32),
        p0=np.ascontiguousarray(p & np.uint32(0xFFFF), dtype=np.uint32),
        p1=np.ascontiguousarray(p >> np.uint32(16), dtype=np.uint32),
    )


@functools.lru_cache(maxsize=64)
def _fwd_cached(params: NTTParams) -> StageTables:
    n, logn = params.n, params.log_n
    j = np.arange(n)
    idx = np.stack(
        [(1 << s) + (j >> (logn - s)) for s in range(logn)], axis=0
    )
    return _expand(params.roots32, params.precon32, idx)


@functools.lru_cache(maxsize=64)
def _inv_cached(params: NTTParams) -> StageTables:
    """Inverse stage s runs m = n >> (s+1), t = 2^s (forward stages reversed);
    position j belongs to group i = j >> (s+1), table index m + i."""
    n, logn = params.n, params.log_n
    j = np.arange(n)
    idx = np.stack(
        [(n >> (s + 1)) + (j >> (s + 1)) for s in range(logn)], axis=0
    )
    return _expand(params.inv_roots32, params.inv_precon32, idx)


def fwd_stage_tables(params: NTTParams) -> StageTables:
    return _fwd_cached(params)


def inv_stage_tables(params: NTTParams) -> StageTables:
    return _inv_cached(params)


@functools.lru_cache(maxsize=128)
def inv_stage_tables_scaled(params: NTTParams, scale: int) -> StageTables:
    """Inverse tables with the final scaling folded into the LAST stage.

    The last GS stage (t = n/2) uses one uniform twiddle w1 = inv_roots[1];
    its positional row becomes `scale` at u slots (multiplying the sum) and
    `scale * w1` at v slots (multiplying the difference), so the standalone
    per-element scaling pass disappears — one mulmod per element per stage,
    including the last.  Exact same outputs as apply_scale (both fully
    reduce mod q).
    """
    base = _inv_cached(params)
    n, q = params.n, params.q
    w1 = int(params.inv_roots32[1])
    wu, wv = scale % q, scale * w1 % q
    w_last = np.where(np.arange(n) < n // 2, np.uint32(wu), np.uint32(wv))
    p_last = np.where(
        np.arange(n) < n // 2,
        np.uint32((wu << 32) // q),
        np.uint32((wv << 32) // q),
    )
    w = base.w.copy(); w[-1] = w_last
    p0 = base.p0.copy(); p0[-1] = p_last & np.uint32(0xFFFF)
    p1 = base.p1.copy(); p1[-1] = p_last >> np.uint32(16)
    return StageTables(w=w, p0=p0, p1=p1)
