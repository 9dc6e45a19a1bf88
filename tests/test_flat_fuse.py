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
