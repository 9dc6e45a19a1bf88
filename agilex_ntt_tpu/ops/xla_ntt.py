"""Pure-XLA (non-Pallas) NTT path.

Runs the *identical* stage math as the Pallas kernels (shared via
``stage_math.py``) as ordinary jitted jnp ops.  Three roles:

  1. Fallback for transform sizes below one lane tile (n < 128 — the
     reference's n=32 configuration, ``/root/reference/include/kernel/ntt.h:11-23``).
  2. Differential-testing twin for the Pallas kernels on any backend.
  3. A compiler baseline: benchmarking Pallas vs. letting XLA schedule the
     same op sequence quantifies what the hand-written kernel buys.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..params import NTTParams
from . import stage_tables as st
from .stage_math import fwd_stages, inv_stages, jnp_roll


def _row_getter(table):
    arr = jnp.asarray(table)
    return lambda s: arr[s : s + 1, :]


@functools.partial(jax.jit, static_argnames=("params",))
def fwd_ntt_xla(x: jnp.ndarray, params: NTTParams) -> jnp.ndarray:
    """Forward negacyclic NTT of (batch, n) uint32 via plain XLA ops."""
    tabs = st.fwd_stage_tables(params)
    ts = tuple(params.n >> (s + 1) for s in range(params.log_n))
    return fwd_stages(
        jnp.asarray(x, dtype=jnp.uint32),
        _row_getter(tabs.w),
        _row_getter(tabs.p0),
        _row_getter(tabs.p1),
        ts=ts,
        q=params.q,
        final_reduce=True,
        roll=jnp_roll,
    )


@functools.partial(jax.jit, static_argnames=("params", "scale"))
def inv_ntt_xla(
    x: jnp.ndarray, params: NTTParams, *, scale: Optional[int] = None
) -> jnp.ndarray:
    """Inverse negacyclic NTT of (batch, n) uint32 via plain XLA ops."""
    if scale is None:
        scale = params.n_inv
    # scaling rides the last stage's twiddle row: no standalone scale pass
    tabs = st.inv_stage_tables_scaled(params, scale)
    ts = tuple(1 << s for s in range(params.log_n))
    return inv_stages(
        jnp.asarray(x, dtype=jnp.uint32),
        _row_getter(tabs.w),
        _row_getter(tabs.p0),
        _row_getter(tabs.p1),
        ts=ts,
        q=params.q,
        roll=jnp_roll,
        scale_in_tables=True,
    )
