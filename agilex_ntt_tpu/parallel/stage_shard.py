"""Stage-sharded (coefficient-parallel) NTT across a mesh axis.

The reference never splits one transform across compute units — a frame's
whole polynomial lives in one CU's BLOCK_RAM (SURVEY.md §5, "one frame never
spans compute units").  But its first stage already contains the structural
seam a distributed NTT exploits: the producer pre-pairs each element with its
partner n/2 away (``/root/reference/src/kernel/ntt.cpp:183-205, 586-589``),
i.e. the early stages pair data that lives far apart.

Here the coefficient axis is sharded over `P = mesh.shape[axis]` devices
(shard size S = n/P).  Forward stages run in HEXL order t = n/2 -> 1:

  * t >= S (the first log2 P stages): the butterfly partner lives on device
    d XOR (t/S).  Each device `ppermute`s its whole shard to its partner over
    ICI and computes its half of every butterfly — the same positional
    ``fwd_stage_step`` as single-chip, with the partner value arriving from
    the wire instead of a lane rotate, and the u/v role a per-device scalar.
  * t < S: purely local; identical math to the single-chip kernel on the
    local shard (optionally as a Pallas kernel), with the positional stage
    tables sharded along the same axis so every device reads its own slice.

The inverse transform mirrors this: local Gentleman-Sande stages first
(t = 1 -> S/2), then log2 P cross-device stages, then the fused scaling.
Outputs are bit-identical to the single-chip kernels.

Communication cost: log2(P) shard-sized ppermutes each way — pairwise
exchanges ride single ICI hops for power-of-two meshes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..params import NTTParams
from ..utils.profiling import under_trace
from ..ops import stage_tables as st
from ..ops import ntt_kernel
from ..ops.stage_math import (
    apply_scale,
    fwd_stage_step,
    fwd_stages,
    inv_stage_step,
    inv_stages,
    jnp_roll,
)


def _row(tab):
    return lambda s: tab[s : s + 1, :]


def _shifted_row(tab, off):
    return lambda s: tab[off + s : off + s + 1, :]


def _fwd_body(
    x, w, p0, p1, *, axis: str, n: int, num_devices: int, q: int,
    use_pallas: bool, interpret: bool, block_rows, comm: str = "ppermute",
    mesh_axes: tuple = (),
):
    """shard_map body. x: (B, S) local shard; w/p0/p1: (log_n, S) local table
    slices."""
    S = n // num_devices
    logn = n.bit_length() - 1
    n_cross = num_devices.bit_length() - 1  # log2 P stages have t >= S
    idx = lax.axis_index(axis)
    for s in range(n_cross):
        t = n >> (s + 1)
        tdev = t // S
        a_log = tdev.bit_length() - 1
        if comm == "overlap":
            from . import overlap

            x = overlap.xchg_stage(
                x, w[s : s + 1], p0[s : s + 1], p1[s : s + 1],
                kind="fwd", axis=axis, mesh_axes=mesh_axes,
                tdev=tdev, a_log=a_log, q=q, last=False,
                interpret=interpret,
            )
            continue
        perm = [(d, d ^ tdev) for d in range(num_devices)]
        recv = lax.ppermute(x, axis, perm)
        is_u = ((idx >> a_log) & 1) == 0  # whole shard shares one role
        x = fwd_stage_step(
            x, recv, is_u, w[s : s + 1], p0[s : s + 1], p1[s : s + 1],
            q=q, last=False,
        )
    local_ts = tuple(n >> (s + 1) for s in range(n_cross, logn))
    if use_pallas:
        x = ntt_kernel.fwd_stages_pallas(
            x, w[n_cross:], p0[n_cross:], p1[n_cross:],
            ts=local_ts, q=q, final_reduce=True,
            block_rows=block_rows, interpret=interpret,
        )
    else:
        x = fwd_stages(
            x, _shifted_row(w, n_cross), _shifted_row(p0, n_cross),
            _shifted_row(p1, n_cross),
            ts=local_ts, q=q, final_reduce=True, roll=jnp_roll,
        )
    return x


def _inv_body(
    x, w, p0, p1, *, axis: str, n: int, num_devices: int, q: int,
    scale: int, scale_precon: int,
    use_pallas: bool, interpret: bool, block_rows, comm: str = "ppermute",
    mesh_axes: tuple = (),
):
    S = n // num_devices
    logn = n.bit_length() - 1
    n_cross = num_devices.bit_length() - 1
    n_local = logn - n_cross
    local_ts = tuple(1 << s for s in range(n_local))
    if use_pallas:
        x = ntt_kernel.inv_stages_pallas(
            x, w[:n_local], p0[:n_local], p1[:n_local],
            ts=local_ts, q=q, block_rows=block_rows, interpret=interpret,
        )
    else:
        x = inv_stages(
            x, _row(w), _row(p0), _row(p1),
            ts=local_ts, q=q, roll=jnp_roll,
        )
    idx = lax.axis_index(axis)
    for s in range(n_local, logn):
        t = 1 << s
        tdev = t // S
        a_log = tdev.bit_length() - 1
        if comm == "overlap":
            from . import overlap

            x = overlap.xchg_stage(
                x, w[s : s + 1], p0[s : s + 1], p1[s : s + 1],
                kind="inv", axis=axis, mesh_axes=mesh_axes,
                tdev=tdev, a_log=a_log, q=q, interpret=interpret,
            )
            continue
        perm = [(d, d ^ tdev) for d in range(num_devices)]
        recv = lax.ppermute(x, axis, perm)
        is_u = ((idx >> a_log) & 1) == 0
        x = inv_stage_step(
            x, recv, is_u, w[s : s + 1], p0[s : s + 1], p1[s : s + 1], q=q
        )
    return apply_scale(x, q=q, scale=scale, scale_precon=scale_precon)


def _specs(dp_axis: Optional[str], sp_axis: str):
    x_spec = P(dp_axis, sp_axis)
    tab_spec = P(None, sp_axis)
    return (x_spec, tab_spec, tab_spec, tab_spec), x_spec


# Device arrays created under a trace must NOT be cached — they would leak
# tracers into later eager calls; under_trace is a pure trace-state query
# (materializing a probe array cost one dispatch per eager call).
_under_trace = under_trace


# device-resident stage tables, cached per params: passing fresh
# jnp.asarray(numpy) arguments to the cached jitted fn would re-upload
# 3*log2(n)*n*4 bytes host->device on every call (measured ~300x per-call
# argument overhead vs a cached device array).  Under an enclosing trace
# (e.g. ShardedRing.polymul's fused jit) return the numpy tables instead:
# they become constants of that trace and nothing tracer-tainted is cached.
@functools.lru_cache(maxsize=256)
def _dev_fwd_tabs_cached(params):
    t = st.fwd_stage_tables(params)
    return jnp.asarray(t.w), jnp.asarray(t.p0), jnp.asarray(t.p1)


def _dev_fwd_tabs(params):
    if _under_trace():
        t = st.fwd_stage_tables(params)
        return t.w, t.p0, t.p1
    return _dev_fwd_tabs_cached(params)


@functools.lru_cache(maxsize=256)
def _dev_inv_tabs_cached(params):
    t = st.inv_stage_tables(params)
    return jnp.asarray(t.w), jnp.asarray(t.p0), jnp.asarray(t.p1)


def _dev_inv_tabs(params):
    if _under_trace():
        t = st.inv_stage_tables(params)
        return t.w, t.p0, t.p1
    return _dev_inv_tabs_cached(params)


# jitted shard_map wrappers are cached: rebuilding jax.jit(...) per call would
# retrace and recompile every invocation (Mesh, NTTParams and all remaining
# keys are hashable; params is interned by make_params's lru_cache).
@functools.lru_cache(maxsize=256)
def _fwd_fn(params, mesh, axis, dp_axis, use_pallas, interpret, block_rows,
            comm="ppermute"):
    in_specs, out_spec = _specs(dp_axis, axis)
    body = functools.partial(
        _fwd_body,
        axis=axis, n=params.n, num_devices=mesh.shape[axis], q=params.q,
        use_pallas=use_pallas, interpret=interpret, block_rows=block_rows,
        comm=comm, mesh_axes=tuple(mesh.axis_names),
    )
    return jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=256)
def _inv_fn(
    params, mesh, axis, dp_axis, scale, scale_precon, use_pallas, interpret,
    block_rows, comm="ppermute",
):
    in_specs, out_spec = _specs(dp_axis, axis)
    body = functools.partial(
        _inv_body,
        axis=axis, n=params.n, num_devices=mesh.shape[axis], q=params.q,
        scale=scale, scale_precon=scale_precon,
        use_pallas=use_pallas, interpret=interpret, block_rows=block_rows,
        comm=comm, mesh_axes=tuple(mesh.axis_names),
    )
    return jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
            check_vma=False,
        )
    )


def stage_sharded_fwd(
    x: jnp.ndarray,
    params: NTTParams,
    mesh: Mesh,
    *,
    axis: str = "sp",
    dp_axis: Optional[str] = None,
    use_pallas: bool = False,
    interpret: bool = False,
    block_rows: Optional[int] = None,
    comm: str = "ppermute",
) -> jnp.ndarray:
    """Forward NTT with coefficients sharded over `axis` (and optionally the
    batch over `dp_axis`).  x: (B, n) uint32 in [0, 4q); output [0, q),
    bit-identical to the single-chip kernel.

    comm: "ppermute" (whole-shard exchange, then compute) or "overlap"
    (chunked Pallas RDMA streaming the partner shard behind the butterfly
    compute — parallel/overlap.py)."""
    num_devices = mesh.shape[axis]
    if params.n % (128 * num_devices):
        raise ValueError(
            f"n={params.n} must give lane-aligned shards over {num_devices} devices"
        )
    if comm not in ("ppermute", "overlap"):
        raise ValueError(f"unknown comm {comm!r}")
    w, p0, p1 = _dev_fwd_tabs(params)
    fn = _fwd_fn(
        params, mesh, axis, dp_axis, use_pallas, interpret, block_rows, comm
    )
    return fn(x, w, p0, p1)


def stage_sharded_inv(
    x: jnp.ndarray,
    params: NTTParams,
    mesh: Mesh,
    *,
    axis: str = "sp",
    dp_axis: Optional[str] = None,
    scale: Optional[int] = None,
    use_pallas: bool = False,
    interpret: bool = False,
    block_rows: Optional[int] = None,
    comm: str = "ppermute",
) -> jnp.ndarray:
    """Inverse NTT with coefficients sharded over `axis`.  x: (B, n) uint32 in
    [0, 2q); output [0, q), bit-identical to the single-chip kernel.
    ``comm`` as in :func:`stage_sharded_fwd`."""
    num_devices = mesh.shape[axis]
    if params.n % (128 * num_devices):
        raise ValueError(
            f"n={params.n} must give lane-aligned shards over {num_devices} devices"
        )
    if comm not in ("ppermute", "overlap"):
        raise ValueError(f"unknown comm {comm!r}")
    if scale is None:
        scale = params.n_inv
    scale_precon = (scale << 32) // params.q
    w, p0, p1 = _dev_inv_tabs(params)
    fn = _inv_fn(
        params, mesh, axis, dp_axis, scale, scale_precon, use_pallas,
        interpret, block_rows, comm,
    )
    return fn(x, w, p0, p1)
