"""Homomorphic polynomial evaluation (BSGS Paterson-Stockmeyer).

`poly_eval` is the workhorse for non-linear functions under FHE
(activation polynomials, bootstrapping's EvalMod); the reference stops at
the forward transform it dispatches (`/root/reference/src/kernel/
ntt.cpp:86-506`).  CKKS results are approximate and checked against
numpy polyval on the slots; BGV results are EXACT mod t
(assert_array_equal).  The recursion's exact-Fraction scale dictation is
pinned directly: the returned scale must equal Delta^2 (CKKS) / the
dictated correction factor algebra (BGV), with no float drift.
"""

from fractions import Fraction

import numpy as np
import pytest

from agilex_ntt_tpu.schemes import CKKSContext
from agilex_ntt_tpu.schemes.bgv import BGVContext

N = 256
SLOTS = N // 2


@pytest.fixture(scope="module")
def ctx():
    return CKKSContext(N, num_primes=6, rng=np.random.default_rng(11))


@pytest.fixture(scope="module")
def keys(ctx):
    return ctx.keygen()


@pytest.fixture(scope="module")
def bctx():
    return BGVContext(N, num_primes=6, rng=np.random.default_rng(5))


@pytest.fixture(scope="module")
def bkeys(bctx):
    return bctx.keygen()


@pytest.fixture()
def rng():
    return np.random.default_rng(3)


def slots(rng, lo=-0.9, hi=0.9, shape=(SLOTS,)):
    return rng.uniform(lo, hi, shape) + 1j * rng.uniform(lo, hi, shape)


def ref_poly(coeffs, z):
    out = np.zeros_like(z)
    for c in reversed(coeffs):
        out = out * z + c
    return out


def dec(ctx, keys, ct):
    return ctx.decode(ctx.decrypt(ct, keys))


# -- CKKS ---------------------------------------------------------------------


def test_linear_no_multiplies(ctx, keys, rng):
    z = slots(rng)
    ct = ctx.encrypt(ctx.encode(z), keys)
    coeffs = [0.25 - 0.5j, 1.5]
    out = ctx.poly_eval(ct, coeffs, keys)
    assert out.level == ctx.L  # depth 0: no level consumed
    assert out.scale == Fraction(ctx.delta) ** 2
    np.testing.assert_allclose(dec(ctx, keys, out), ref_poly(coeffs, z),
                               atol=1e-3)


def test_cubic(ctx, keys, rng):
    z = slots(rng)
    ct = ctx.encrypt(ctx.encode(z), keys)
    coeffs = [0.5, -1.0, 0.25, 0.75]
    out = ctx.poly_eval(ct, coeffs, keys)
    assert out.scale == Fraction(ctx.delta) ** 2
    np.testing.assert_allclose(dec(ctx, keys, out), ref_poly(coeffs, z),
                               atol=5e-3)


def test_degree8_complex_coeffs(ctx, keys, rng):
    z = slots(rng, -0.8, 0.8)
    ct = ctx.encrypt(ctx.encode(z), keys)
    coeffs = [0.1 + 0.2j, -0.4, 0.3j, 0.2, -0.15,
              0.1 - 0.1j, 0.05, -0.08, 0.06]
    out = ctx.poly_eval(ct, coeffs, keys)
    assert out.scale == Fraction(ctx.delta) ** 2
    np.testing.assert_allclose(dec(ctx, keys, out), ref_poly(coeffs, z),
                               atol=5e-2)


def test_sparse_gaps(ctx, keys, rng):
    # x^5 + 0.5: zero coefficients skip work but not correctness
    z = slots(rng, -0.8, 0.8)
    ct = ctx.encrypt(ctx.encode(z), keys)
    coeffs = [0.5, 0, 0, 0, 0, 0.8]
    out = ctx.poly_eval(ct, coeffs, keys)
    np.testing.assert_allclose(dec(ctx, keys, out), ref_poly(coeffs, z),
                               atol=2e-2)


def test_rescale_composes(ctx, keys, rng):
    # the Delta^2 product convention composes with one rescale, like
    # multiply()
    z = slots(rng)
    ct = ctx.encrypt(ctx.encode(z), keys)
    coeffs = [0.0, 0.5, 0.5]
    out = ctx.rescale(ctx.poly_eval(ct, coeffs, keys))
    np.testing.assert_allclose(dec(ctx, keys, out), ref_poly(coeffs, z),
                               atol=5e-3)


def test_batched(ctx, keys, rng):
    z = slots(rng, shape=(3, SLOTS))
    ct = ctx.encrypt(ctx.encode(z), keys)
    coeffs = [0.2, -0.3, 0.4]
    out = ctx.poly_eval(ct, coeffs, keys)
    np.testing.assert_allclose(dec(ctx, keys, out), ref_poly(coeffs, z),
                               atol=5e-3)


def test_constant_polynomial(ctx, keys, rng):
    z = slots(rng)
    ct = ctx.encrypt(ctx.encode(z), keys)
    out = ctx.poly_eval(ct, [0.75 + 0.25j], keys)
    np.testing.assert_allclose(dec(ctx, keys, out),
                               np.full(SLOTS, 0.75 + 0.25j), atol=1e-3)


def test_chain_too_short_raises_before_any_work(rng):
    short = CKKSContext(N, num_primes=3, rng=np.random.default_rng(2))
    kk = short.keygen()
    z = slots(rng)
    ct = short.encrypt(short.encode(z), kk)
    with pytest.raises(ValueError, match="prime level"):
        short.poly_eval(ct, [0.1] * 9, kk)  # degree 8 needs ~5 levels


def test_result_level_must_hold_delta_squared(rng):
    # a cubic on a 3-prime chain would land at level 1, where the
    # Delta^2 output scale wraps mod Q_1 and decodes to garbage — the
    # plan must refuse, not silently return a wrong answer
    short = CKKSContext(N, num_primes=3, rng=np.random.default_rng(2))
    kk = short.keygen()
    ct = short.encrypt(short.encode(slots(rng)), kk)
    with pytest.raises(ValueError, match="level >= 2"):
        short.poly_eval(ct, [0.5, -1.0, 0.25, 0.75], kk)


def test_degree4_constant_quotient(ctx, keys, rng):
    # deg == k*2^j: the quotient is the single constant c_4, so the
    # giant term is a PLAINTEXT multiply — no relinearization and no
    # level consumed (result one level higher than the full-node form)
    z = slots(rng, -0.8, 0.8)
    ct = ctx.encrypt(ctx.encode(z), keys)
    coeffs = [0.1, -0.4, 0.3, 0.2, -0.15]
    out = ctx.poly_eval(ct, coeffs, keys)
    assert out.level == ctx.L - 2  # x^2/x^3 depth only
    np.testing.assert_allclose(dec(ctx, keys, out), ref_poly(coeffs, z),
                               atol=2e-2)


def test_empty_coeffs_raises(ctx, keys, rng):
    ct = ctx.encrypt(ctx.encode(slots(rng)), keys)
    with pytest.raises(ValueError, match="non-empty"):
        ctx.poly_eval(ct, [], keys)


# -- BGV: exact mod t ---------------------------------------------------------


def bgv_ref(coeffs, m, t):
    out = np.zeros_like(m)
    for c in reversed(coeffs):
        out = (out * m + int(c)) % t
    return out


def test_bgv_cubic_exact(bctx, bkeys, rng):
    m = rng.integers(0, bctx.t, size=(2, SLOTS))
    ct = bctx.encrypt(bctx.encode(m), bkeys)
    coeffs = [3, 7, 1, 5]
    out = bctx.poly_eval(ct, coeffs, bkeys)
    np.testing.assert_array_equal(
        dec(bctx, bkeys, out) % bctx.t, bgv_ref(coeffs, m, bctx.t)
    )


def test_bgv_degree8_exact(bctx, bkeys, rng):
    m = rng.integers(0, bctx.t, size=(2, SLOTS))
    ct = bctx.encrypt(bctx.encode(m), bkeys)
    coeffs = [2, 0, 11, 0, 5, 1, 0, 9, 4]
    out = bctx.poly_eval(ct, coeffs, bkeys)
    np.testing.assert_array_equal(
        dec(bctx, bkeys, out) % bctx.t, bgv_ref(coeffs, m, bctx.t)
    )


def test_bgv_float_coeff_raises(bctx, bkeys, rng):
    # the exact scheme must refuse silently-truncating coefficients
    m = rng.integers(0, bctx.t, size=(2, SLOTS))
    ct = bctx.encrypt(bctx.encode(m), bkeys)
    with pytest.raises(ValueError, match="integers mod t"):
        bctx.poly_eval(ct, [0.5, 2], bkeys)
