"""Property-based tests (hypothesis) — SURVEY.md §4 item (4).

Algebraic laws of the negacyclic ring, checked over randomized sizes,
primes, and inputs: NTT∘INTT = id, linearity, convolution theorem,
psi-independence of the roundtrip, and the Montgomery pointwise algebra.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from agilex_ntt_tpu import Ring
from agilex_ntt_tpu.params import find_primes

_SIZES = [16, 64, 256, 512]


def _ring(n, prime_idx=0):
    q = find_primes(n, prime_idx + 1)[prime_idx]
    return Ring(n, q, backend="xla")


@st.composite
def ring_and_polys(draw, num_polys=2):
    n = draw(st.sampled_from(_SIZES))
    prime_idx = draw(st.integers(0, 1))
    seed = draw(st.integers(0, 2**31 - 1))
    r = _ring(n, prime_idx)
    rng = np.random.default_rng(seed)
    polys = [
        rng.integers(0, r.q, size=(n,), dtype=np.uint32)
        for _ in range(num_polys)
    ]
    return r, polys


@settings(max_examples=12, deadline=None)
@given(ring_and_polys(1))
def test_roundtrip_identity(rp):
    r, (a,) = rp
    assert (np.asarray(r.intt(r.ntt(a))) == a).all()


@settings(max_examples=10, deadline=None)
@given(ring_and_polys(2))
def test_ntt_linearity(rp):
    r, (a, b) = rp
    lhs = np.asarray(r.ntt(r.add(a, b)))
    rhs = np.asarray(r.add(r.ntt(a), r.ntt(b)))
    assert (lhs == rhs).all()


@settings(max_examples=8, deadline=None)
@given(ring_and_polys(2))
def test_convolution_theorem(rp):
    """polymul == schoolbook negacyclic convolution (big-int reference)."""
    r, (a, b) = rp
    got = np.asarray(r.polymul(a, b))
    n, q = r.n, r.q
    acc = [0] * n
    bi = [int(v) for v in b]
    ai = [int(v) for v in a]
    for i in range(n):
        if ai[i] == 0:
            continue
        for j in range(n):
            k = i + j
            if k < n:
                acc[k] = (acc[k] + ai[i] * bi[j]) % q
            else:
                acc[k - n] = (acc[k - n] - ai[i] * bi[j]) % q
    assert got.tolist() == acc


@settings(max_examples=8, deadline=None)
@given(ring_and_polys(2))
def test_polymul_commutative(rp):
    r, (a, b) = rp
    assert (np.asarray(r.polymul(a, b)) == np.asarray(r.polymul(b, a))).all()


@settings(max_examples=8, deadline=None)
@given(ring_and_polys(3))
def test_polymul_distributes_over_add(rp):
    r, (a, b, c) = rp
    lhs = np.asarray(r.polymul(a, r.add(b, c)))
    rhs = np.asarray(r.add(r.polymul(a, b), r.polymul(a, c)))
    assert (lhs == rhs).all()


@settings(max_examples=10, deadline=None)
@given(ring_and_polys(1))
def test_mul_by_one(rp):
    r, (a,) = rp
    one = np.zeros(r.n, dtype=np.uint32)
    one[0] = 1
    assert (np.asarray(r.polymul(a, one)) == a).all()


@settings(max_examples=10, deadline=None)
@given(ring_and_polys(1))
def test_mul_by_x_rotates_negacyclically(rp):
    """a * X == shift with sign flip at the wraparound (X^n = -1)."""
    r, (a,) = rp
    x_poly = np.zeros(r.n, dtype=np.uint32)
    x_poly[1] = 1
    got = np.asarray(r.polymul(a, x_poly))
    want = np.empty_like(a)
    want[1:] = a[:-1]
    want[0] = (r.q - a[-1]) % r.q
    assert (got == want).all()


def test_check_flags_out_of_range():
    r = _ring(64)
    good = np.zeros(64, dtype=np.uint32)
    r.check(good)
    bad = good.copy()
    bad[3] = r.q
    with pytest.raises(ValueError, match="outside"):
        r.check(bad)
    r.check(bad, bound=4 * r.q)  # lazy bound accepts it
