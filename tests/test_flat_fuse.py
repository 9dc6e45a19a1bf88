"""Flat-layout fused four-step kernels: bit-exactness vs the tiled path.

The flat kernels (``ops/flat_fuse.py``) must be bit-identical to the
two-layout four-step chain (``ops/fourstep.py``), which is itself pinned to
the golden model and the committed KAT battery — so equality here certifies
the whole flat path.  Interpret mode (the emulator analog of the reference's
``-DFPGA_EMULATOR`` flow, ``/root/reference/src/main.cpp:16-20``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from agilex_ntt_tpu.params import find_primes
from agilex_ntt_tpu.ops.modmul import mont_qinv_neg
from agilex_ntt_tpu.ops.flat_fuse import (
    fwd_ntt_fourstep_flat,
    inv_ntt_fourstep_flat,
    polymul_fourstep_flat,
)
from agilex_ntt_tpu.ops.fourstep import (
    fwd_ntt_fourstep,
    inv_ntt_fourstep,
    make_plan,
    polymul_fourstep_fused,
)


CASES = [
    (1024, 3, None),      # n1=32, n2=32: sub-lane-width strides both passes
    (4096, 5, None),      # square split, batch not a multiple of 8
    (8192, 8, 64),        # uneven split n1=64, n2=128
    (65536, 2, None),     # the production flat-tax size (n1=n2=256)
]


@pytest.mark.parametrize("n,b,n1", CASES)
def test_flat_fwd_bit_exact(rng, n, b, n1):
    q = find_primes(n, 1)[0]
    plan = make_plan(n, q, n1=n1)
    x = rng.integers(0, q, size=(b, n), dtype=np.uint32)
    got = np.asarray(fwd_ntt_fourstep_flat(jnp.asarray(x), plan, interpret=True))
    want = np.asarray(
        fwd_ntt_fourstep(jnp.asarray(x), plan, backend="pallas", interpret=True)
    )
    assert (got == want).all()


@pytest.mark.parametrize("n,b,n1", CASES)
def test_flat_inv_bit_exact(rng, n, b, n1):
    q = find_primes(n, 1)[0]
    plan = make_plan(n, q, n1=n1)
    y = rng.integers(0, q, size=(b, n), dtype=np.uint32)
    got = np.asarray(inv_ntt_fourstep_flat(jnp.asarray(y), plan, interpret=True))
    want = np.asarray(
        inv_ntt_fourstep(jnp.asarray(y), plan, backend="pallas", interpret=True)
    )
    assert (got == want).all()


def test_flat_roundtrip_and_lazy_input(rng):
    """fwd accepts lazy [0, 4q) input like the tiled kernels; inv(fwd(x)) = x."""
    n, b = 4096, 4
    q = find_primes(n, 1)[0]
    plan = make_plan(n, q)
    x = rng.integers(0, q, size=(b, n), dtype=np.uint32)
    # x < q, so x + k*q < 4q for k in 0..3: in the kernel's lazy input range
    lazy = x + np.uint32(q) * rng.integers(0, 4, size=x.shape).astype(np.uint32)
    y = fwd_ntt_fourstep_flat(jnp.asarray(lazy), plan, interpret=True)
    back = np.asarray(inv_ntt_fourstep_flat(y, plan, interpret=True))
    assert (back == x % q).all()


def test_flat_polymul_bit_exact(rng):
    n, b = 4096, 4
    q = find_primes(n, 1)[0]
    plan = make_plan(n, q)
    a = rng.integers(0, q, size=(b, n), dtype=np.uint32)
    c = rng.integers(0, q, size=(b, n), dtype=np.uint32)
    # same scale contract as api.Ring.polymul: fold n^-1 with R^-1
    scale = plan.n_inv * ((1 << 32) % q) % q
    got = np.asarray(
        polymul_fourstep_flat(
            jnp.asarray(a), jnp.asarray(c), plan,
            scale=scale, qinv_neg=mont_qinv_neg(q), interpret=True,
        )
    )
    want = np.asarray(
        polymul_fourstep_fused(
            jnp.asarray(a), jnp.asarray(c), plan,
            scale=scale, qinv_neg=mont_qinv_neg(q), interpret=True,
        )
    )
    assert (got == want).all()


def test_flat_vmem_guard_model():
    """Byte-aware VMEM guard (VERDICT round-4 item 3): the model must
    reject the configuration that OOM'd on hardware (polymul n=2^16,
    block_rows=8 allocated 134.34 MiB of 128 — report_out/hw_r3/
    ab_flat.err) and accept the ones that measured fine."""
    from agilex_ntt_tpu.ops.flat_fuse import (
        _VMEM_BUDGET,
        flat_vmem_bytes,
        max_flat_block_rows,
    )

    q = find_primes(1 << 16, 1)[0]
    plan = make_plan(1 << 16, q)
    # the hardware OOM config must be over budget...
    assert flat_vmem_bytes(plan, 8, "polymul") > _VMEM_BUDGET
    # ...and the model must agree with the observed 134.34 MiB within 10%
    assert abs(flat_vmem_bytes(plan, 8, "polymul") - 134.34 * 2**20) < (
        0.10 * 134.34 * 2**20
    )
    # 8 is the minimum legal block height for padded batches, so polymul
    # at 2^16 has NO flat configuration: api.Ring falls back to tiled
    assert max_flat_block_rows(plan, "polymul") is None
    # the single-transform kernels that ran at block_rows=8 stay allowed
    assert max_flat_block_rows(plan, "fwd") == 8
    assert max_flat_block_rows(plan, "inv") == 8
    # polymul fits at the size below (n=2^15: smaller tables and blocks)
    q15 = find_primes(1 << 15, 1)[0]
    assert max_flat_block_rows(make_plan(1 << 15, q15), "polymul") == 8


def test_flat_ring_feasibility_dispatch():
    """A flat Ring at n=2^16 must mark polymul infeasible (falls back to
    the tiled fused kernel) while keeping fwd/inv on the flat path; in
    interpret mode everything stays flat (no VMEM)."""
    from agilex_ntt_tpu import Ring

    r = Ring(1 << 16, method="fourstep", backend="pallas",
             fourstep_kernel="flat")
    assert r._flat_fits == {"fwd": True, "inv": True, "polymul": False}
    ri = Ring(1 << 16, method="fourstep", backend="pallas",
              fourstep_kernel="flat", interpret=True)
    assert all(ri._flat_fits.values())


def test_flat_polymul_clamped_block_rows_bit_exact(rng):
    """polymul with block_rows clamped below the request stays bit-exact
    (the guard changes only the grid split, never the math)."""
    n, b = 4096, 8
    q = find_primes(n, 1)[0]
    plan = make_plan(n, q)
    a = rng.integers(0, q, size=(b, n), dtype=np.uint32)
    c = rng.integers(0, q, size=(b, n), dtype=np.uint32)
    scale = plan.n_inv * ((1 << 32) % q) % q
    got = np.asarray(
        polymul_fourstep_flat(
            jnp.asarray(a), jnp.asarray(c), plan,
            scale=scale, qinv_neg=mont_qinv_neg(q), block_rows=2,
            interpret=True,
        )
    )
    want = np.asarray(
        polymul_fourstep_flat(
            jnp.asarray(a), jnp.asarray(c), plan,
            scale=scale, qinv_neg=mont_qinv_neg(q), interpret=True,
        )
    )
    assert (got == want).all()


def test_flat_explicit_block_rows(rng):
    """block_rows that does not divide the batch is snapped to a divisor."""
    n = 1024
    q = find_primes(n, 1)[0]
    plan = make_plan(n, q)
    x = rng.integers(0, q, size=(6, n), dtype=np.uint32)
    got = np.asarray(
        fwd_ntt_fourstep_flat(jnp.asarray(x), plan, block_rows=4, interpret=True)
    )
    want = np.asarray(
        fwd_ntt_fourstep(jnp.asarray(x), plan, backend="pallas", interpret=True)
    )
    assert (got == want).all()
