"""Four-step (Bailey) decomposition of the negacyclic NTT for large n.

The reference caps its transform size at n = 32768 because the whole
polynomial must fit one compute unit's BLOCK_RAM (state arrays at
``/root/reference/src/kernel/ntt.cpp:90-101``; size menu
``include/kernel/ntt.h:11-23``) — "one frame never spans compute units"
(SURVEY.md §5).  The TPU analog of that wall is VMEM: the single-pass radix-2
kernel keeps (log2 n, n) positional stage tables resident, which stops
scaling around n = 2^18.  The four-step factorization n = n1 * n2 removes the
wall: two passes of small transforms whose working sets are sqrt(n)-sized.

Derivation (negacyclic, HEXL evaluation order).  For the size-n negacyclic
transform X(k) = sum_j x_j psi^((2k+1) j), write j = r*n2 + c and
k = k2*n1 + k1:

    X(k) = sum_c psi^((2k1+1) c) * omega^(k2 c) * G[k1, c]
    G[k1, c] = sum_r x[r*n2 + c] * psi1^((2k1+1) r)

with psi1 = psi^n2 (a primitive 2*n1-th root => the column pass is exactly a
size-n1 *negacyclic* NTT) and omega = psi^(2*n1) (a primitive n2-th root =>
the row pass is a size-n2 *cyclic* NTT).  Since our kernels emit bit-reversed
outputs, position p = bitrev_n(k) = bitrev(k1)*n2 + bitrev(k2) — the column
pass lands rows at bitrev(k1), the row pass lands columns at bitrev(k2), and
the composed output is **bit-identical to the single-pass kernel** with no
reordering pass at all.  The twiddle scale T[r1, c] = psi^((2*bitrev(r1)+1) c)
between the passes is one positional Shoup mulmod.

The same three steps with the coefficient axis sharded over a mesh give the
multi-chip transform: local column NTTs -> scale -> ICI all-to-all transpose
-> local row NTTs (SURVEY.md §5; see ``parallel/fourstep_shard.py``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import (
    CyclicParams,
    NTTParams,
    bit_reverse,
    find_psi,
    fourstep_split,
    is_prime,
    log2_exact,
    make_cyclic_params,
    make_params,
)
from . import ntt_kernel, xla_ntt
from .modmul import mont_mul_lazy, shoup_mulmod_lazy_presplit


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash; interned by
# make_plan's lru_cache so it can ride jit static args like NTTParams does.
class FourStepPlan:
    """Precomputed decomposition of one (n, q) ring into n1 x n2 passes."""

    n: int
    q: int
    psi: int
    n1: int
    n2: int
    col: NTTParams      # size-n1 negacyclic transform, psi1 = psi^n2
    row: CyclicParams   # size-n2 cyclic transform, omega = psi^(2*n1)
    # inter-pass twiddle scale T[r1, c] = psi^((2*bitrev(r1)+1) c), with
    # pre-split Shoup precons (same layout as the kernels' stage tables)
    tw: np.ndarray      # uint32 (n1, n2)
    tp0: np.ndarray     # uint32 (n1, n2) precon low 16
    tp1: np.ndarray     # uint32 (n1, n2) precon high 16
    itw: np.ndarray     # inverse scale psi^(-(2*bitrev(r1)+1) c)
    itp0: np.ndarray
    itp1: np.ndarray
    n_inv: int          # n^-1 mod q

    @property
    def log_n(self) -> int:
        return log2_exact(self.n)


def _check_modulus(q: int) -> None:
    """Direct-plan entry points must enforce the same preconditions Ring
    does via NTTConfig: 4q < 2**32 (uint32 lazy invariant) and primality
    (Fermat n_inv)."""
    if q >= (1 << 30):
        raise ValueError(
            f"q must be < 2**30 for uint32 lazy arithmetic, got {q}"
        )
    if not is_prime(q):
        raise ValueError(f"q={q} is not prime")


def _presplit(w: np.ndarray, q: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(w, precon_lo16, precon_hi16) as uint32 — w < 2^30 so w << 32 < 2^62
    fits uint64 exactly."""
    p = (w.astype(np.uint64) << np.uint64(32)) // np.uint64(q)
    p = p.astype(np.uint32)
    return (
        w.astype(np.uint32),
        p & np.uint32(0xFFFF),
        p >> np.uint32(16),
    )


@functools.lru_cache(maxsize=32)
def make_plan(
    n: int, q: int, psi: Optional[int] = None, n1: Optional[int] = None
) -> FourStepPlan:
    """Build the four-step plan for Z_q[X]/(X^n + 1).

    Setup cost is O(n) host work but only O(sqrt(n)) Python bignum pows —
    the big (n1, n2) scale table is generated vectorized — so plans for
    n = 2^20 build in well under a second.
    """
    if q % (2 * n) != 1:
        raise ValueError(f"q ≡ 1 (mod 2n) required: q={q} n={n}")
    _check_modulus(q)
    if psi is None:
        psi = find_psi(n, q)
    elif pow(psi, n, q) != q - 1:
        raise ValueError("provided psi is not a primitive 2n-th root")
    if n1 is None:
        n1, n2 = fourstep_split(n)
    else:
        n2 = n // n1
    if n1 * n2 != n or n1 < 2 or n2 < 2:
        raise ValueError(f"bad split {n} = {n1} * {n2}")

    psi1 = pow(psi, n2, q)
    omega = pow(psi, 2 * n1, q)
    col = make_params(n1, q, psi1)
    row = make_cyclic_params(n2, q, omega)

    # scale table: psi^e with e = (2*bitrev(r1, log n1) + 1) * c mod 2n.
    # psi powers 0..2n-1 as a plain-int list (2n modmuls, ~0.5 s at n=2^20),
    # then a vectorized gather.
    pows = [1] * (2 * n)
    acc = 1
    for i in range(1, 2 * n):
        acc = acc * psi % q
        pows[i] = acc
    pows_np = np.array(pows, dtype=np.uint64)
    l1 = log2_exact(n1)
    k1 = np.array([bit_reverse(r, l1) for r in range(n1)], dtype=np.int64)
    e = ((2 * k1[:, None] + 1) * np.arange(n2, dtype=np.int64)[None, :]) % (2 * n)
    tw, tp0, tp1 = _presplit(pows_np[e], q)
    itw, itp0, itp1 = _presplit(pows_np[(-e) % (2 * n)], q)

    return FourStepPlan(
        n=n, q=q, psi=psi, n1=n1, n2=n2, col=col, row=row,
        tw=tw, tp0=tp0, tp1=tp1, itw=itw, itp0=itp0, itp1=itp1,
        n_inv=pow(n, q - 2, q),
    )


# ---------------------------------------------------------------------------
# Fused column-pass kernels (TPU fast path): the (n1, n2) matrix transpose
# happens on-chip inside the kernel tile instead of as two HBM-roundtrip XLA
# transposes, and the inter-pass twiddle scale rides along in the same pass.
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from . import stage_tables as st  # noqa: E402
from .ntt_kernel import _pallas_roll, _row_reader  # noqa: E402
from .stage_math import (  # noqa: E402
    fwd_stages,
    fwd_stages_axis0,
    inv_stages,
    inv_stages_axis0,
)


def _col_reader(ref):
    """Stage s of a column-oriented (n1, log n1) table -> (n1, 1) slice."""
    return lambda s: ref[:, s : s + 1]


def _col_tabs_T(tabs) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Column-pass stage tables transposed to (n1, log n1): the axis-0 stage
    chain broadcasts each stage's (n1, 1) column along lanes."""
    return (
        np.ascontiguousarray(np.asarray(tabs.w).T),
        np.ascontiguousarray(np.asarray(tabs.p0).T),
        np.ascontiguousarray(np.asarray(tabs.p1).T),
    )


def _col_fwd_kernel(x_ref, w_ref, p0_ref, p1_ref, tw_ref, tp0_ref, tp1_ref,
                    o_ref, *, ts, q):
    # column transform along axis 0 via sublane rolls — no transposes (the
    # earlier v.T ... .T form cost two on-chip relayouts per tile; measured
    # 1.27x slower at n=65536, round 2)
    v = fwd_stages_axis0(
        x_ref[0], _col_reader(w_ref), _col_reader(p0_ref), _col_reader(p1_ref),
        ts=ts, q=q, final_reduce=True, roll=_pallas_roll,
    )
    o_ref[0] = shoup_mulmod_lazy_presplit(
        v, tw_ref[:], tp0_ref[:], tp1_ref[:], q
    )


def _col_inv_kernel(x_ref, w_ref, p0_ref, p1_ref, itw_ref, itp0_ref, itp1_ref,
                    o_ref, *, ts, q, scale, scale_precon):
    v = shoup_mulmod_lazy_presplit(
        x_ref[0], itw_ref[:], itp0_ref[:], itp1_ref[:], q
    )
    o_ref[0] = inv_stages_axis0(
        v, _col_reader(w_ref), _col_reader(p0_ref), _col_reader(p1_ref),
        ts=ts, q=q, scale=scale, scale_precon=scale_precon, roll=_pallas_roll,
    )


def _col_tile(n1: int, n2: int) -> int:
    # ~1 MiB tiles: (n1, TC) uint32
    tc = max(128, (1 << 20) // (4 * n1))
    while n2 % tc:
        tc //= 2
    return min(tc, n2)


def _col_pass_fwd(x3, plan, *, interpret):
    b, n1, n2 = x3.shape
    cw, cp0, cp1 = _col_tabs_T(st.fwd_stage_tables(plan.col))
    logn1 = n1.bit_length() - 1
    ts = tuple(n1 >> (s + 1) for s in range(logn1))
    tc = _col_tile(n1, n2)
    tab_spec = pl.BlockSpec(
        (n1, logn1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(
        (n1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec(
        (1, n1, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    kern = functools.partial(_col_fwd_kernel, ts=ts, q=plan.q)
    return pl.pallas_call(
        kern,
        grid=(b, n2 // tc),
        in_specs=[x_spec, tab_spec, tab_spec, tab_spec,
                  scale_spec, scale_spec, scale_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n1, n2), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x3, jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(plan.tw), jnp.asarray(plan.tp0), jnp.asarray(plan.tp1),
    )


def _col_pass_inv(x3, plan, *, col_scale, interpret):
    b, n1, n2 = x3.shape
    cw, cp0, cp1 = _col_tabs_T(st.inv_stage_tables(plan.col))
    logn1 = n1.bit_length() - 1
    ts = tuple(1 << s for s in range(logn1))
    scale_precon = (col_scale << 32) // plan.q
    tc = _col_tile(n1, n2)
    tab_spec = pl.BlockSpec(
        (n1, logn1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(
        (n1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec(
        (1, n1, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _col_inv_kernel, ts=ts, q=plan.q, scale=col_scale,
        scale_precon=scale_precon,
    )
    return pl.pallas_call(
        kern,
        grid=(b, n2 // tc),
        in_specs=[x_spec, tab_spec, tab_spec, tab_spec,
                  scale_spec, scale_spec, scale_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n1, n2), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x3, jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(plan.itw), jnp.asarray(plan.itp0), jnp.asarray(plan.itp1),
    )


def _use_fused_col(plan, backend: str) -> bool:
    return (
        backend == "pallas"
        and plan.n1 >= ntt_kernel.MIN_KERNEL_N
        and plan.n2 >= ntt_kernel.MIN_KERNEL_N
    )


# ---------------------------------------------------------------------------
# Fully fused transform: when the whole (n1, n2) matrix fits VMEM (n up to
# ~2^21), both passes + the scale run in ONE kernel — a single HBM read and
# write per polynomial, the TPU analog of the reference keeping the whole
# frame resident in BLOCK_RAM (ntt.cpp:90-101) across all stages.
# ---------------------------------------------------------------------------

# Matrix-size cap for the fully fused kernel.  Round-1 (transpose-form
# kernels) froze this at 2 MiB because the 4 MiB matrix lost to the
# two-kernel path (9.0 vs 6.6 K NTT/s).  Round-2's no-transpose kernels
# (axis-0 column stages) flip the result at 4 MiB: fwd 6.62 vs 6.40 K,
# inv 6.16 vs 4.98 K NTT/s on v5e — so the cap is now 4 MiB (n = 2^20 with
# a square split).  Cost: the 20-stage fused kernel takes several minutes
# to compile cold (amortized by the jit/XLA compile cache).
_FULL_FUSE_BYTES = 4 << 20


def _use_full_fuse(plan, backend: str) -> bool:
    return (
        _use_fused_col(plan, backend)
        and 4 * plan.n1 * plan.n2 <= _FULL_FUSE_BYTES
    )


# The single-kernel polymul holds TWO operand tiles plus both transforms'
# live temporaries (3x the stage chains of one transform), so its matrix
# cap stays at 2 MiB (n <= 2^19) — beyond that the composed chain wins on
# VMEM pressure and compile time.
_POLYMUL_FUSE_BYTES = 2 << 20


def use_polymul_fuse(plan, backend: str) -> bool:
    return (
        _use_fused_col(plan, backend)
        and 4 * plan.n1 * plan.n2 <= _POLYMUL_FUSE_BYTES
    )


def _full_fwd_kernel(x_ref, cw, cp0, cp1, rw, rp0, rp1, tw, tp0, tp1, o_ref,
                     *, ts1, ts2, q):
    # column transform along axis 0 (sublane rolls, no transposes: measured
    # 1.27x at n=65536 vs the transpose form, round 2), then scale, then the
    # row transform along lanes
    v = fwd_stages_axis0(
        x_ref[0], _col_reader(cw), _col_reader(cp0), _col_reader(cp1),
        ts=ts1, q=q, final_reduce=True, roll=_pallas_roll,
    )
    v = shoup_mulmod_lazy_presplit(v, tw[:], tp0[:], tp1[:], q)
    v = fwd_stages(
        v, _row_reader(rw), _row_reader(rp0), _row_reader(rp1),
        ts=ts2, q=q, final_reduce=True, roll=_pallas_roll,
    )
    o_ref[0] = v


def _full_inv_kernel(x_ref, cw, cp0, cp1, rw, rp0, rp1, itw, itp0, itp1,
                     o_ref, *, ts1, ts2, q, row_scale, row_precon, col_scale,
                     col_precon):
    v = inv_stages(
        x_ref[0], _row_reader(rw), _row_reader(rp0), _row_reader(rp1),
        ts=ts2, q=q, scale=row_scale, scale_precon=row_precon,
        roll=_pallas_roll,
    )
    v = shoup_mulmod_lazy_presplit(v, itw[:], itp0[:], itp1[:], q)
    o_ref[0] = inv_stages_axis0(
        v, _col_reader(cw), _col_reader(cp0), _col_reader(cp1),
        ts=ts1, q=q, scale=col_scale, scale_precon=col_precon,
        roll=_pallas_roll,
    )


def _full_specs(plan):
    n1, n2 = plan.n1, plan.n2
    ln1, ln2 = n1.bit_length() - 1, n2.bit_length() - 1
    x_spec = pl.BlockSpec(
        (1, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    ctab = pl.BlockSpec((n1, ln1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rtab = pl.BlockSpec((ln2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stab = pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return x_spec, ctab, rtab, stab


def _full_pass_fwd(x3, plan, *, interpret):
    b, n1, n2 = x3.shape
    cw, cp0, cp1 = _col_tabs_T(st.fwd_stage_tables(plan.col))
    rtabs = st.fwd_stage_tables(plan.row)
    ts1 = tuple(n1 >> (s + 1) for s in range(n1.bit_length() - 1))
    ts2 = tuple(n2 >> (s + 1) for s in range(n2.bit_length() - 1))
    x_spec, ctab, rtab, stab = _full_specs(plan)
    kern = functools.partial(_full_fwd_kernel, ts1=ts1, ts2=ts2, q=plan.q)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[x_spec, ctab, ctab, ctab, rtab, rtab, rtab,
                  stab, stab, stab],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n1, n2), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x3, jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(rtabs.w), jnp.asarray(rtabs.p0), jnp.asarray(rtabs.p1),
        jnp.asarray(plan.tw), jnp.asarray(plan.tp0), jnp.asarray(plan.tp1),
    )


def _full_pass_inv(x3, plan, *, col_scale, interpret):
    b, n1, n2 = x3.shape
    cw, cp0, cp1 = _col_tabs_T(st.inv_stage_tables(plan.col))
    rtabs = st.inv_stage_tables(plan.row)
    ts1 = tuple(1 << s for s in range(n1.bit_length() - 1))
    ts2 = tuple(1 << s for s in range(n2.bit_length() - 1))
    row_scale = plan.row.n_inv
    x_spec, ctab, rtab, stab = _full_specs(plan)
    kern = functools.partial(
        _full_inv_kernel, ts1=ts1, ts2=ts2, q=plan.q,
        row_scale=row_scale, row_precon=(row_scale << 32) // plan.q,
        col_scale=col_scale, col_precon=(col_scale << 32) // plan.q,
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[x_spec, ctab, ctab, ctab, rtab, rtab, rtab,
                  stab, stab, stab],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n1, n2), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x3, jnp.asarray(cw), jnp.asarray(cp0), jnp.asarray(cp1),
        jnp.asarray(rtabs.w), jnp.asarray(rtabs.p0), jnp.asarray(rtabs.p1),
        jnp.asarray(plan.itw), jnp.asarray(plan.itp0), jnp.asarray(plan.itp1),
    )


def _full_polymul_kernel(
    a_ref, b_ref, fcw, fcp0, fcp1, frw, frp0, frp1, ftw, ftp0, ftp1,
    icw, icp0, icp1, irw, irp0, irp1, itw, itp0, itp1, o_ref,
    *, ts1f, ts2f, ts1i, ts2i, q, qinv_neg, row_scale, row_precon,
    col_scale, col_precon,
):
    """Negacyclic polymul with BOTH four-step transforms + pointwise + the
    inverse, all on the resident (n1, n2) tile: 2 HBM reads + 1 write per
    polynomial instead of the 7 passes of the composed form (the large-n
    analog of ntt_kernel.polymul_fused, and of the reference frame never
    leaving BLOCK_RAM between pipeline phases, ntt.cpp:90-101, 508-640)."""

    def fwd4(v):
        v = fwd_stages_axis0(
            v, _col_reader(fcw), _col_reader(fcp0), _col_reader(fcp1),
            ts=ts1f, q=q, final_reduce=True, roll=_pallas_roll,
        )
        v = shoup_mulmod_lazy_presplit(v, ftw[:], ftp0[:], ftp1[:], q)
        return fwd_stages(
            v, _row_reader(frw), _row_reader(frp0), _row_reader(frp1),
            ts=ts2f, q=q, final_reduce=True, roll=_pallas_roll,
        )

    fa = fwd4(a_ref[0])
    fb = fwd4(b_ref[0])
    prod = mont_mul_lazy(fa, fb, q, qinv_neg)  # [0, 2q); R^-1 in col_scale
    v = inv_stages(
        prod, _row_reader(irw), _row_reader(irp0), _row_reader(irp1),
        ts=ts2i, q=q, scale=row_scale, scale_precon=row_precon,
        roll=_pallas_roll,
    )
    v = shoup_mulmod_lazy_presplit(v, itw[:], itp0[:], itp1[:], q)
    o_ref[0] = inv_stages_axis0(
        v, _col_reader(icw), _col_reader(icp0), _col_reader(icp1),
        ts=ts1i, q=q, scale=col_scale, scale_precon=col_precon,
        roll=_pallas_roll,
    )


@functools.partial(
    jax.jit, static_argnames=("plan", "scale", "qinv_neg", "interpret")
)
def polymul_fourstep_fused_tiled(
    a3: jnp.ndarray,
    b3: jnp.ndarray,
    plan: FourStepPlan,
    *,
    scale: int,
    qinv_neg: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused four-step polymul on the resident tiled layout ((B, n1, n2) in
    and out — see ``fwd_ntt_fourstep_tiled``); the single-kernel core of
    ``polymul_fourstep_fused``."""
    b_sz, n1, n2 = a3.shape[0], plan.n1, plan.n2
    q = plan.q
    fc = _col_tabs_T(st.fwd_stage_tables(plan.col))
    fr = st.fwd_stage_tables(plan.row)
    ic = _col_tabs_T(st.inv_stage_tables(plan.col))
    ir = st.inv_stage_tables(plan.row)
    ln1, ln2 = n1.bit_length() - 1, n2.bit_length() - 1
    ts1f = tuple(n1 >> (s + 1) for s in range(ln1))
    ts2f = tuple(n2 >> (s + 1) for s in range(ln2))
    ts1i = tuple(1 << s for s in range(ln1))
    ts2i = tuple(1 << s for s in range(ln2))
    row_scale = plan.row.n_inv
    col_scale = scale * plan.n2 % q
    x_spec, ctab, rtab, stab = _full_specs(plan)
    kern = functools.partial(
        _full_polymul_kernel,
        ts1f=ts1f, ts2f=ts2f, ts1i=ts1i, ts2i=ts2i, q=q, qinv_neg=qinv_neg,
        row_scale=row_scale, row_precon=(row_scale << 32) // q,
        col_scale=col_scale, col_precon=(col_scale << 32) // q,
    )
    out = pl.pallas_call(
        kern,
        grid=(b_sz,),
        in_specs=[x_spec, x_spec] + [ctab] * 3 + [rtab] * 3 + [stab] * 3
        + [ctab] * 3 + [rtab] * 3 + [stab] * 3,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b_sz, n1, n2), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        a3, b3,
        jnp.asarray(fc[0]), jnp.asarray(fc[1]), jnp.asarray(fc[2]),
        jnp.asarray(fr.w), jnp.asarray(fr.p0), jnp.asarray(fr.p1),
        jnp.asarray(plan.tw), jnp.asarray(plan.tp0), jnp.asarray(plan.tp1),
        jnp.asarray(ic[0]), jnp.asarray(ic[1]), jnp.asarray(ic[2]),
        jnp.asarray(ir.w), jnp.asarray(ir.p0), jnp.asarray(ir.p1),
        jnp.asarray(plan.itw), jnp.asarray(plan.itp0), jnp.asarray(plan.itp1),
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("plan", "scale", "qinv_neg", "interpret")
)
def polymul_fourstep_fused(
    a: jnp.ndarray,
    b: jnp.ndarray,
    plan: FourStepPlan,
    *,
    scale: int,
    qinv_neg: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Negacyclic a*b mod (X^n + 1, q) as ONE kernel on four-step rings.

    `scale` must fold n^-1 and the Montgomery R (api.Ring.polymul_scale).
    Requires a full-fuse-eligible plan (matrix <= _FULL_FUSE_BYTES); callers
    fall back to the composed transform chain beyond that.
    """
    b_sz, n1, n2 = a.shape[0], plan.n1, plan.n2
    out = polymul_fourstep_fused_tiled(
        a.reshape(b_sz, n1, n2), b.reshape(b_sz, n1, n2), plan,
        scale=scale, qinv_neg=qinv_neg, interpret=interpret,
    )
    return out.reshape(b_sz, plan.n)


@functools.lru_cache(maxsize=32)
def make_cyclic_plan(
    n: int, q: int, omega: int, n1: Optional[int] = None
) -> FourStepPlan:
    """Four-step plan for the size-n *cyclic* NTT (root omega of order n).

    Same machinery as the negacyclic plan with both passes cyclic:
    X(k) = sum_c omega^(c*k1) * omega2^(c*k2) * G[k1, c], where
    G[k1, c] is the size-n1 cyclic transform of column c with
    omega1 = omega^n2, and the row pass uses omega2 = omega^n1.  The
    inter-pass scale is T[r1, c] = omega^(c * bitrev(r1)).  Output order is
    bit-reversed exactly like the single-pass cyclic kernel.
    """
    _check_modulus(q)
    if pow(omega, n, q) != 1 or (n > 1 and pow(omega, n // 2, q) == 1):
        raise ValueError("omega is not a primitive n-th root")
    if n1 is None:
        n1, n2 = fourstep_split(n)
    else:
        n2 = n // n1
    if n1 * n2 != n or n1 < 2 or n2 < 2:
        raise ValueError(f"bad split {n} = {n1} * {n2}")
    col = make_cyclic_params(n1, q, pow(omega, n2, q))
    row = make_cyclic_params(n2, q, pow(omega, n1, q))

    pows = [1] * n
    acc = 1
    for i in range(1, n):
        acc = acc * omega % q
        pows[i] = acc
    pows_np = np.array(pows, dtype=np.uint64)
    l1 = log2_exact(n1)
    k1 = np.array([bit_reverse(r, l1) for r in range(n1)], dtype=np.int64)
    e = (k1[:, None] * np.arange(n2, dtype=np.int64)[None, :]) % n
    tw, tp0, tp1 = _presplit(pows_np[e], q)
    itw, itp0, itp1 = _presplit(pows_np[(-e) % n], q)
    return FourStepPlan(
        n=n, q=q, psi=0, n1=n1, n2=n2, col=col, row=row,
        tw=tw, tp0=tp0, tp1=tp1, itw=itw, itp0=itp0, itp1=itp1,
        n_inv=pow(n, q - 2, q),
    )


def _fwd_small(x, params, *, backend, block_rows, interpret):
    if backend == "pallas" and params.n >= ntt_kernel.MIN_KERNEL_N:
        return ntt_kernel.fwd_ntt(
            x, params, block_rows=block_rows, interpret=interpret
        )
    return xla_ntt.fwd_ntt_xla(x, params)


def _inv_small(x, params, *, scale, backend, block_rows, interpret):
    if backend == "pallas" and params.n >= ntt_kernel.MIN_KERNEL_N:
        return ntt_kernel.inv_ntt(
            x, params, scale=scale, block_rows=block_rows, interpret=interpret
        )
    return xla_ntt.inv_ntt_xla(x, params, scale=scale)


@functools.partial(
    jax.jit, static_argnames=("plan", "backend", "block_rows", "interpret")
)
def fwd_ntt_fourstep_tiled(
    x3: jnp.ndarray,
    plan: FourStepPlan,
    *,
    backend: str = "pallas",
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward four-step NTT on the resident tiled layout: (B, n1, n2) in
    and out, NO flat boundary reshapes.

    On TPU a rank-2 (B, n) <-> rank-3 (B, n1, n2) reshape is a physical HBM
    relayout (the last two dims carry the (8, 128) tiling) costing ~0.87 ms
    per in+out pair at 128 MB — the four-step API-boundary tax measured in
    BASELINE.md.  Chained pipelines should ingress once via ``Ring.to_tiled``
    and stay rank-3 (the exact analog of staying in the NTT domain between
    multiplies).  Bit-identical to ``fwd_ntt_fourstep`` on the flattened
    input.
    """
    b = x3.shape[0]
    n1, n2 = plan.n1, plan.n2
    if _use_full_fuse(plan, backend):
        return _full_pass_fwd(x3, plan, interpret=interpret)
    if _use_fused_col(plan, backend):
        # fused column pass: on-chip tile transposes + fused twiddle scale
        # (no HBM-roundtrip XLA transposes, no standalone scale pass)
        m2 = _col_pass_fwd(x3, plan, interpret=interpret)
    else:
        # column pass: size-n1 negacyclic NTT down each of the n2 columns
        xc = x3.transpose(0, 2, 1).reshape(b * n2, n1)
        yc = _fwd_small(
            xc, plan.col, backend=backend, block_rows=block_rows,
            interpret=interpret,
        )
        m1 = yc.reshape(b, n2, n1).transpose(0, 2, 1)  # rows land at br(k1)
        # inter-pass twiddle scale (positional Shoup mulmod, lazy [0, 2q))
        m2 = shoup_mulmod_lazy_presplit(
            m1,
            jnp.asarray(plan.tw)[None],
            jnp.asarray(plan.tp0)[None],
            jnp.asarray(plan.tp1)[None],
            plan.q,
        )
    # row pass: size-n2 cyclic NTT along each row (leading-dim merges only:
    # layout-preserving, unlike the flat rank-2 boundary)
    rows = m2.reshape(b * n1, n2)
    out = _fwd_small(
        rows, plan.row, backend=backend, block_rows=block_rows, interpret=interpret
    )
    return out.reshape(b, n1, n2)


@functools.partial(
    jax.jit, static_argnames=("plan", "backend", "block_rows", "interpret")
)
def fwd_ntt_fourstep(
    x: jnp.ndarray,
    plan: FourStepPlan,
    *,
    backend: str = "pallas",
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward negacyclic NTT of (batch, n) uint32 via two sqrt(n)-size passes.

    Input in [0, 4q); output in [0, q), bit-identical to the single-pass
    kernel (``ntt_kernel.fwd_ntt``) / the uint64 golden model.
    """
    b = x.shape[0]
    out = fwd_ntt_fourstep_tiled(
        x.reshape(b, plan.n1, plan.n2), plan, backend=backend,
        block_rows=block_rows, interpret=interpret,
    )
    return out.reshape(b, plan.n)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "scale", "backend", "block_rows", "interpret"),
)
def inv_ntt_fourstep_tiled(
    x3: jnp.ndarray,
    plan: FourStepPlan,
    *,
    scale: Optional[int] = None,
    backend: str = "pallas",
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inverse four-step NTT on the resident tiled layout ((B, n1, n2) in
    and out — see ``fwd_ntt_fourstep_tiled`` for why rank-3 callers skip
    the HBM relayout tax).  Bit-identical to ``inv_ntt_fourstep``."""
    if scale is None:
        scale = plan.n_inv
    col_scale = scale * plan.n2 % plan.q
    b = x3.shape[0]
    n1, n2 = plan.n1, plan.n2
    if _use_full_fuse(plan, backend):
        return _full_pass_inv(x3, plan, col_scale=col_scale,
                              interpret=interpret)
    # row pass: inverse cyclic size-n2 (undoes the forward's last pass)
    rows = x3.reshape(b * n1, n2)
    r = _inv_small(
        rows, plan.row, scale=plan.row.n_inv,
        backend=backend, block_rows=block_rows, interpret=interpret,
    )
    if _use_fused_col(plan, backend):
        # fused: unscale + on-chip transposes + inverse column transform
        return _col_pass_inv(
            r.reshape(b, n1, n2), plan, col_scale=col_scale,
            interpret=interpret,
        )
    # unscale (inverse inter-pass twiddles)
    m = r.reshape(b, n1, n2)
    m = shoup_mulmod_lazy_presplit(
        m,
        jnp.asarray(plan.itw)[None],
        jnp.asarray(plan.itp0)[None],
        jnp.asarray(plan.itp1)[None],
        plan.q,
    )
    # column pass: inverse negacyclic size-n1 with the residual scale folded
    xc = m.transpose(0, 2, 1).reshape(b * n2, n1)
    c = _inv_small(
        xc, plan.col, scale=col_scale,
        backend=backend, block_rows=block_rows, interpret=interpret,
    )
    return c.reshape(b, n2, n1).transpose(0, 2, 1)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "scale", "backend", "block_rows", "interpret"),
)
def inv_ntt_fourstep(
    x: jnp.ndarray,
    plan: FourStepPlan,
    *,
    scale: Optional[int] = None,
    backend: str = "pallas",
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inverse negacyclic NTT of (batch, n) uint32, mirroring the forward.

    `scale` overrides the overall n^-1 multiplier (e.g. to fold a Montgomery
    R factor, see api.polymul); it is split as row-pass n2^-1 then column-pass
    scale * n2.  Input may be lazy in [0, 2q); output in [0, q).
    """
    b = x.shape[0]
    out = inv_ntt_fourstep_tiled(
        x.reshape(b, plan.n1, plan.n2), plan, scale=scale, backend=backend,
        block_rows=block_rows, interpret=interpret,
    )
    return out.reshape(b, plan.n)
