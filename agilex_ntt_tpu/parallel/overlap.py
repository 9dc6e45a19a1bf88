"""Compute/comm-overlapped cross-device butterfly exchange (Pallas RDMA).

The ppermute form in ``stage_shard.py`` serializes each cross-device stage:
the whole shard crosses ICI, THEN every butterfly computes.  Here the
exchange is one Pallas kernel per stage that chunks the local shard along
the batch axis and issues every chunk's ``pltpu.make_async_remote_copy`` up
front — the ICI DMA engine streams chunk c+1 (and beyond) while the VPU
computes butterflies on chunk c, hiding all but the first chunk's wire time
(SURVEY.md §7 hard part 4; the pattern of SNIPPETS.md §[3]).

The reference's analog is on-chip only: its FIFO pipes let the producer
stream frame words while the compute unit butterflies earlier words
(`/root/reference/src/kernel/ntt.cpp:183-205, 577-595`) — this module is
that producer/consumer overlap lifted to the chip-to-chip interconnect.

Selected via ``sp_comm="overlap"`` on ShardedRing / stage_sharded_fwd/inv.
Bit-identical to the ppermute path (tests/test_overlap.py, dryrun step 3b);
single-chip hardware cannot measure the gain — ``tools/ab_overlap.py`` is
the staged A/B for a pod slice.

Correctness notes:

- Pairwise barrier first: device d signals its partner's barrier semaphore
  and waits for one signal, so neither side's RDMA can land before the
  partner's kernel (and thus its recv buffer) is live.
- One DMA semaphore PER CHUNK (not a shared counter): chunk completions
  count bytes on the semaphore they were issued with, so waiting chunk c
  can never be satisfied by chunk c+1's bytes having arrived first.
- Every send is awaited before the kernel returns — the source buffer may
  be donated/reused by XLA the instant the kernel ends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.stage_math import fwd_stage_step, inv_stage_step

# chunks per shard: enough to hide the wire behind compute without
# fragmenting the DMA engine; shards with fewer than 2*8 sublane rows run
# unchunked (still bit-exact — the overlap is simply empty).
MAX_CHUNKS = 8


def _num_chunks(batch: int) -> int:
    c = MAX_CHUNKS
    while c > 1 and batch % (c * 8):
        c //= 2
    return c


def _interp(interpret: bool):
    # plain interpret=True cannot emulate cross-device DMAs; the TPU
    # interpreter can.  dma_execution_mode must be "eager": "on_wait"
    # defers the modelled copy until the RECEIVER waits, by which time the
    # sender's kernel may have returned and freed the source buffer (the
    # interpreter raises KeyError on the dead buffer).  Eager copies run at
    # start(), which the entry barrier has made safe — the partner's
    # buffers are live.
    if not interpret:
        return False
    return pltpu.InterpretParams(dma_execution_mode="eager")


@functools.lru_cache(maxsize=512)
def _xchg_call(
    kind: str,
    axis: str,
    mesh_axes: tuple,
    tdev: int,
    a_log: int,
    q: int,
    last: bool,
    batch: int,
    width: int,
    interpret: bool,
):
    """Build the per-stage exchange+butterfly pallas_call (cached: one
    compile per (stage geometry, shard shape))."""
    num_chunks = _num_chunks(batch)
    chunk = batch // num_chunks

    def kernel(x_ref, w_ref, p0_ref, p1_ref, out_ref, recv_ref,
               send_sems, recv_sems):
        my_sp = lax.axis_index(axis)
        partner_sp = my_sp ^ tdev
        # full mesh coordinates of the partner: same position on every
        # axis but the sp axis (the exchange never crosses dp/ch planes)
        device_id = tuple(
            partner_sp if name == axis else lax.axis_index(name)
            for name in mesh_axes
        )
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=device_id,
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        pltpu.semaphore_wait(barrier, 1)
        ops = []
        for c in range(num_chunks):
            sl = pl.ds(c * chunk, chunk)
            op = pltpu.make_async_remote_copy(
                src_ref=x_ref.at[sl],
                dst_ref=recv_ref.at[sl],
                send_sem=send_sems.at[c],
                recv_sem=recv_sems.at[c],
                device_id=device_id,
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            op.start()
            ops.append(op)
        is_u = ((my_sp >> a_log) & 1) == 0
        w, p0, p1 = w_ref[...], p0_ref[...], p1_ref[...]
        for c in range(num_chunks):
            sl = pl.ds(c * chunk, chunk)
            ops[c].wait_recv()
            xc, rc = x_ref[sl], recv_ref[sl]
            if kind == "fwd":
                out = fwd_stage_step(
                    xc, rc, is_u, w, p0, p1, q=q, last=last
                )
            else:
                out = inv_stage_step(xc, rc, is_u, w, p0, p1, q=q)
            out_ref[sl] = out
        for c in range(num_chunks):
            ops[c].wait_send()

    # explicit VMEM memory spaces: DMA source/dest classification reads the
    # ref aval's memory_space, and default-pipelined block refs carry none
    # (the TPU interpreter then mistakes them for HBM buffers and dies)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, width), jnp.uint32),
        in_specs=[vmem, vmem, vmem, vmem],
        out_specs=vmem,
        scratch_shapes=[
            pltpu.VMEM((batch, width), jnp.uint32),       # recv buffer
            pltpu.SemaphoreType.DMA((num_chunks,)),       # send sems
            pltpu.SemaphoreType.DMA((num_chunks,)),       # recv sems
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7,
        ),
        interpret=_interp(interpret),
    )


def xchg_stage(
    x: jnp.ndarray,
    w_row: jnp.ndarray,
    p0_row: jnp.ndarray,
    p1_row: jnp.ndarray,
    *,
    kind: str,
    axis: str,
    mesh_axes: tuple,
    tdev: int,
    a_log: int,
    q: int,
    last: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """One cross-device butterfly stage with the partner shard streamed in
    chunks overlapping the butterfly compute.  Call from inside a shard_map
    body; x: (B_local, S) uint32.  Bit-identical to
    ``ppermute + {fwd,inv}_stage_step``."""
    call = _xchg_call(
        kind, axis, tuple(mesh_axes), int(tdev), int(a_log), int(q),
        bool(last), x.shape[0], x.shape[1], bool(interpret),
    )
    return call(x, w_row, p0_row, p1_row)
