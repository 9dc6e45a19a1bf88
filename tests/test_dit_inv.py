"""DIT-form (descending-stride) inverse NTT: bit-exactness vs the golden
inverse and agreement with the production GS inverse.

This path exists as the round-2 VERDICT item 6 experiment (see
ops/dit_inv.py for the derivation); correctness is pinned here so the
hardware A/B (tools/ab_inv.py) measures two *proven-equal* transforms.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from agilex_ntt_tpu import golden
from agilex_ntt_tpu.ops import dit_inv
from agilex_ntt_tpu.params import find_primes, make_params


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_dit_inverse_matches_golden(n):
    q = find_primes(n, 1)[0]
    p = make_params(n, q)
    rng = np.random.default_rng(7)
    x = rng.integers(0, q, size=(8, n), dtype=np.uint32)
    X = golden.fwd_ntt_u32(x, p)
    ref = golden.inv_ntt_u32(X, p)
    out = np.asarray(dit_inv.inv_ntt_dit(jnp.asarray(X), p, interpret=True))
    np.testing.assert_array_equal(out, ref)
    # and it round-trips the original input
    np.testing.assert_array_equal(out, x)


def test_dit_inverse_factored_bitrev():
    n = 4096  # log n = 12 (even) -> factored split-radix bitrev applies
    q = find_primes(n, 1)[0]
    p = make_params(n, q)
    rng = np.random.default_rng(8)
    x = rng.integers(0, q, size=(4, n), dtype=np.uint32)
    X = golden.fwd_ntt_u32(x, p)
    out = np.asarray(
        dit_inv.inv_ntt_dit(jnp.asarray(X), p, interpret=True, factored=True)
    )
    np.testing.assert_array_equal(out, golden.inv_ntt_u32(X, p))


def test_dit_inverse_accepts_lazy_input():
    """Same input contract as inv_ntt: values in [0, 2q)."""
    n = 256
    q = find_primes(n, 1)[0]
    p = make_params(n, q)
    rng = np.random.default_rng(9)
    x = rng.integers(0, q, size=(4, n), dtype=np.uint32)
    X = golden.fwd_ntt_u32(x, p)
    lazy = X + np.where(rng.integers(0, 2, size=X.shape) == 1, q, 0).astype(
        np.uint32
    )
    out = np.asarray(dit_inv.inv_ntt_dit(jnp.asarray(lazy), p, interpret=True))
    np.testing.assert_array_equal(out, golden.inv_ntt_u32(X, p))


def test_bitrev_permute_is_involution():
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(3, 4096), dtype=np.uint32))
    for fac in (False, True):
        y = dit_inv.bitrev_permute(dit_inv.bitrev_permute(x, factored=fac),
                                   factored=fac)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # direct and factored agree
    np.testing.assert_array_equal(
        np.asarray(dit_inv.bitrev_permute(x)),
        np.asarray(dit_inv.bitrev_permute(x, factored=True)),
    )
