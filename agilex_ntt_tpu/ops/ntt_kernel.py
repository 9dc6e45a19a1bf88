"""Pallas TPU kernels: forward / inverse negacyclic NTT (components C1, C3, C4).

TPU-native redesign of the reference's deeply pipelined FPGA compute kernel
(``fwd_ntt_kernel``, ``/root/reference/src/kernel/ntt.cpp:86-506``).  The
mapping is deliberately *not* a translation:

  * The reference vectorizes VEC=8 butterflies **within one polynomial** and
    therefore needs five hand-specialized shuffle networks for strides
    t < VEC (C4, ntt.cpp:207-289, 398-479).  Here the polynomial's n
    coefficients ride the 128-wide **lane** dimension and the batch rides the
    **sublane** dimension, so every stage is uniform row arithmetic; strided
    butterfly pairing becomes two lane-rotates + selects (`jnp.roll`), the
    TPU register-permute analog of the FPGA shuffle network.
  * The banked BLOCK_RAM double-buffer with generation tags (C3,
    ntt.cpp:90-98, 321-344) exists to break RAW hazards in a hardware
    pipeline; under XLA's functional semantics each stage is a pure value
    computation, so the hazard (and the `Xm` tag machinery) vanishes.
  * Twiddle tables stream via FIFO pipes into kernel-local RAM in the
    reference (C5, ntt.cpp:122-141); here the positional stage tables are
    pallas_call operands resident in VMEM, re-used across the whole batch
    grid.
  * Frame streaming over depth-16 pipes (C6/C7/C9) becomes the pallas grid
    pipeline: BlockSpecs double-buffer (block_rows, n) batch tiles
    HBM -> VMEM -> HBM automatically.

Arithmetic is the Harvey lazy butterfly in uint32 words (q < 2**30, values in
[0, 4q)): conditional -2q reduction (ntt.cpp:331-332), Shoup mulmod via 16-bit
limb partials (ntt.cpp:346-363 scaled down one word size), X' = tx + Q and
X_t' = tx + 2q - Q (ntt.cpp:368-369), final-stage correction to [0, q)
(ntt.cpp:377-394).  Outputs are bit-identical to the uint64 golden model.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import NTTParams
from . import stage_tables as st
from .modmul import U32, cond_sub, mulhi_u32_presplit, u32

DEFAULT_BLOCK_ROWS = 64


def _partner(x: jnp.ndarray, mask_u: jnp.ndarray, t: int) -> jnp.ndarray:
    """Value of each position's butterfly partner.

    Positions with (j >> log2(t)) even are 'u' slots (partner at j + t),
    odd are 'v' slots (partner at j - t).  Two circular lane-rotates cover
    both cases; rotated-in wraparound values are never selected.
    This replaces the reference's stride-specialized shuffle networks
    (ntt.cpp:207-289).
    """
    n = x.shape[1]
    fwd = pltpu.roll(x, shift=n - t, axis=1)  # brings x[j + t] to slot j
    bwd = pltpu.roll(x, shift=t, axis=1)      # brings x[j - t] to slot j
    return jnp.where(mask_u, fwd, bwd)


def _stage_masks(shape, logn: int):
    """mask_u per stage: True where position j is the first butterfly input."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    return lane


def _fwd_kernel(x_ref, w_ref, p0_ref, p1_ref, o_ref, *, n, logn, q):
    x = x_ref[:]
    two_q = U32(2 * q)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    for s in range(logn):
        t = n >> (s + 1)
        t_log = logn - 1 - s
        w = w_ref[s : s + 1, :]
        p0 = p0_ref[s : s + 1, :]
        p1 = p1_ref[s : s + 1, :]
        mask_u = ((lane >> t_log) & 1) == 0

        pu = _partner(x, mask_u, t)
        tx = jnp.where(mask_u, x, pu)
        ay = jnp.where(mask_u, pu, x)
        tx = cond_sub(tx, two_q)
        # Shoup: Q = W*ay - floor(ay * Wp / 2^32) * q, in [0, 2q)
        hi = mulhi_u32_presplit(ay, p0, p1)
        Q = w * ay - hi * U32(q)
        out = jnp.where(mask_u, tx + Q, tx + two_q - Q)
        if s == logn - 1:
            out = cond_sub(cond_sub(out, two_q), U32(q))
        x = out
    o_ref[:] = x


def _inv_kernel(
    x_ref, w_ref, p0_ref, p1_ref, o_ref, *, n, logn, q, scale, scale_precon
):
    x = x_ref[:]
    two_q = U32(2 * q)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    for s in range(logn):
        t = 1 << s
        w = w_ref[s : s + 1, :]
        p0 = p0_ref[s : s + 1, :]
        p1 = p1_ref[s : s + 1, :]
        mask_u = ((lane >> s) & 1) == 0

        pu = _partner(x, mask_u, t)
        # Gentleman-Sande: u' = x + y (lazy < 2q); v' = (x - y + 2q) * W
        ssum = cond_sub(x + pu, two_q)
        d = jnp.where(mask_u, x - pu, pu - x) + two_q
        hi = mulhi_u32_presplit(d, p0, p1)
        Q = w * d - hi * U32(q)
        x = jnp.where(mask_u, ssum, Q)
    # scale by n^-1 (or a caller-fused constant, e.g. n^-1 * 2^32 for the
    # Montgomery-pointwise polymul path), then final reduce to [0, q)
    sp0 = U32(scale_precon & 0xFFFF)
    sp1 = U32(scale_precon >> 16)
    hi = mulhi_u32_presplit(x, sp0, sp1)
    x = U32(scale) * x - hi * U32(q)
    o_ref[:] = cond_sub(x, U32(q))


def _pick_block_rows(batch: int, requested: Optional[int]) -> int:
    if requested is not None:
        return requested
    b = DEFAULT_BLOCK_ROWS
    while b > 8 and batch % b != 0:
        b //= 2
    return b


def _call(kernel, x, tables: st.StageTables, *, block_rows, interpret):
    batch, n = x.shape
    block_rows = _pick_block_rows(batch, block_rows)
    if batch % block_rows:
        raise ValueError(f"batch {batch} not a multiple of block_rows {block_rows}")
    logn = n.bit_length() - 1
    grid = (batch // block_rows,)
    tab_spec = pl.BlockSpec((logn, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            tab_spec,
            tab_spec,
            tab_spec,
        ],
        out_specs=pl.BlockSpec(
            (block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, tables.w, tables.p0, tables.p1)


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
    """
    tabs = st.fwd_stage_tables(params)
    kern = functools.partial(
        _fwd_kernel, n=params.n, logn=params.log_n, q=params.q
    )
    return _call(kern, x, tabs, block_rows=block_rows, interpret=interpret)


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
    scale_precon = (scale << 32) // params.q
    tabs = st.inv_stage_tables(params)
    kern = functools.partial(
        _inv_kernel,
        n=params.n,
        logn=params.log_n,
        q=params.q,
        scale=scale,
        scale_precon=scale_precon,
    )
    return _call(kern, x, tabs, block_rows=block_rows, interpret=interpret)
