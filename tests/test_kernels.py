"""Pallas kernel tests (interpret mode on CPU — the TPU analog of the
reference's FPGA emulator flow, SURVEY.md §4).

Bit-exactness is checked against the u32 golden model, which is itself checked
against the u64 reference-mirror model and the independent big-int oracle in
test_golden.py — so a pass here chains all the way to the O(n^2) evaluation
definition of the negacyclic NTT.
"""

import numpy as np
import pytest

from agilex_ntt_tpu import golden as G
from agilex_ntt_tpu.ops import ntt_kernel as K

from conftest import params_for

INTERP = dict(interpret=True)


@pytest.mark.parametrize("n", [128, 1024, 4096])
def test_fwd_matches_golden(n, rng):
    pp = params_for(n)
    x = rng.integers(0, pp.q, size=(16, n), dtype=np.uint32)
    got = np.asarray(K.fwd_ntt(x, pp, block_rows=8, **INTERP))
    want = G.fwd_ntt_u32(x, pp)
    assert (got == want).all()


@pytest.mark.parametrize("n", [128, 1024])
def test_inv_matches_golden(n, rng):
    pp = params_for(n)
    y = rng.integers(0, pp.q, size=(16, n), dtype=np.uint32)
    got = np.asarray(K.inv_ntt(y, pp, block_rows=8, **INTERP))
    want = G.inv_ntt_u32(y, pp)
    assert (got == want).all()


def test_roundtrip(rng):
    n = 1024
    pp = params_for(n)
    x = rng.integers(0, pp.q, size=(8, n), dtype=np.uint32)
    y = K.fwd_ntt(x, pp, block_rows=8, **INTERP)
    z = np.asarray(K.inv_ntt(y, pp, block_rows=8, **INTERP))
    assert (z == x).all()


def test_fwd_accepts_lazy_input(rng):
    """Forward kernel tolerates inputs in [0, 4q) like the reference's lazy
    pipeline (state invariant at ntt.cpp:331-332, 368-369)."""
    n = 256
    pp = params_for(n)
    x = rng.integers(0, pp.q, size=(8, n), dtype=np.uint32)
    shifted = (x + np.uint32(2 * pp.q)).astype(np.uint32)  # same residues
    a = np.asarray(K.fwd_ntt(x, pp, block_rows=8, **INTERP))
    b = np.asarray(K.fwd_ntt(shifted, pp, block_rows=8, **INTERP))
    assert (a == b).all()


def test_inv_accepts_lazy_input(rng):
    n = 256
    pp = params_for(n)
    y = rng.integers(0, pp.q, size=(8, n), dtype=np.uint32)
    lazy = (y + np.uint32(pp.q)).astype(np.uint32)
    a = np.asarray(K.inv_ntt(y, pp, block_rows=8, **INTERP))
    b = np.asarray(K.inv_ntt(lazy, pp, block_rows=8, **INTERP))
    assert (a == b).all()


def test_inv_custom_scale(rng):
    """The scale override (used to fold Montgomery R out of polymul)."""
    n = 256
    pp = params_for(n)
    q = pp.q
    y = rng.integers(0, q, size=(8, n), dtype=np.uint32)
    c = 12345 % q
    scale = pp.n_inv * c % q
    got = np.asarray(K.inv_ntt(y, pp, scale=scale, block_rows=8, **INTERP))
    base = G.inv_ntt_u32(y, pp).astype(object)
    assert (got.astype(object) == (base * c) % q).all()


def test_block_rows_grid(rng):
    """Multiple grid steps (the pipe-pipeline analog) give identical results."""
    n = 256
    pp = params_for(n)
    x = rng.integers(0, pp.q, size=(64, n), dtype=np.uint32)
    a = np.asarray(K.fwd_ntt(x, pp, block_rows=8, **INTERP))
    b = np.asarray(K.fwd_ntt(x, pp, block_rows=32, **INTERP))
    assert (a == b).all()
    assert (a == G.fwd_ntt_u32(x, pp)).all()


def test_pick_block_rows_legal_shapes():
    """The picked block height must satisfy the Pallas TPU block rule
    (multiple of 8, or the whole batch).  batch=2072 (= 8*7*37, the BSGS
    matvec bake's padded 45x46 diagonal count) once snapped to its
    divisor 74 and died in the Mosaic lowering (round-5 suite run)."""
    pick = K._pick_block_rows
    assert pick(2072, 4096, None) == 56          # largest 8-multiple divisor
    for batch in (8, 16, 56, 64, 2072, 4096, 2070, 3):
        for req in (None, 8, 48, 74, 128):
            b = pick(batch, 4096, req)
            assert batch % b == 0
            assert b % 8 == 0 or b == batch, (batch, req, b)


def test_polymul_fused_kernel_matches_golden(rng):
    """One-kernel polymul (fwd x2 + Montgomery pointwise + scaled inverse)."""
    from agilex_ntt_tpu.ops.modmul import mont_qinv_neg

    n = 256
    pp = params_for(n)
    q = pp.q
    scale = pp.n_inv * ((1 << 32) % q) % q  # fold n^-1 and Montgomery R
    a = rng.integers(0, q, size=(8, n), dtype=np.uint32)
    b = rng.integers(0, q, size=(8, n), dtype=np.uint32)
    got = np.asarray(K.polymul_fused(
        a, b, pp, scale=scale, qinv_neg=mont_qinv_neg(q),
        block_rows=8, **INTERP,
    ))
    fa = G.fwd_ntt_u32(a, pp).astype(np.uint64)
    fb = G.fwd_ntt_u32(b, pp).astype(np.uint64)
    prod = ((fa * fb) % np.uint64(q)).astype(np.uint32)
    want = G.inv_ntt_u32(prod, pp)
    assert (got == want).all()


def test_polydot_fused_interpret_bit_exact(rng):
    """Round-2 single-kernel polydot vs the composed form (interpret mode)."""
    import jax.numpy as jnp

    from agilex_ntt_tpu import Ring
    from agilex_ntt_tpu.ops import ntt_kernel as K

    n, k, B = 256, 3, 8
    ring = Ring(n, backend="xla")
    a = rng.integers(0, ring.q, size=(B, k, n), dtype=np.uint32)
    b = rng.integers(0, ring.q, size=(B, k, n), dtype=np.uint32)
    got = np.asarray(
        K.polydot_fused(
            jnp.asarray(a), jnp.asarray(b), ring.params,
            scale=ring.polymul_scale, qinv_neg=ring.qinv_neg, interpret=True,
        )
    )
    want = np.asarray(ring.polydot(a, b))  # composed (XLA) oracle
    assert (got == want).all()


def test_rns_single_kernel_interpret_bit_exact(rng):
    """Round-2 multi-prime single-kernel transforms (channel = grid axis,
    q from SMEM) vs the per-channel stacked composition."""
    import jax.numpy as jnp

    from agilex_ntt_tpu import RNSRing
    from agilex_ntt_tpu.ops import ntt_kernel as K

    n, L, B = 256, 3, 8
    rns = RNSRing(n, num_primes=L, backend="xla")  # stacked oracle
    params_tuple = tuple(r.params for r in rns.rings)
    x = np.stack(
        [rng.integers(0, r.q, size=(B, n), dtype=np.uint32) for r in rns.rings]
    )
    got = np.asarray(
        K.fwd_ntt_rns(jnp.asarray(x), params_tuple, interpret=True)
    )
    want = np.asarray(rns.ntt(x))
    assert (got == want).all()
    back = np.asarray(
        K.inv_ntt_rns(jnp.asarray(got), params_tuple, interpret=True)
    )
    assert (back == x).all()

    a = np.stack(
        [rng.integers(0, r.q, size=(B, n), dtype=np.uint32) for r in rns.rings]
    )
    pm = np.asarray(
        K.polymul_rns_fused(
            jnp.asarray(a), jnp.asarray(x), params_tuple,
            scales=tuple(r.polymul_scale for r in rns.rings),
            qinv_negs=tuple(r.qinv_neg for r in rns.rings),
            interpret=True,
        )
    )
    want_pm = np.asarray(rns.polymul(a, x))
    assert (pm == want_pm).all()


def test_rns_polydot_single_kernel_interpret(rng):
    """Round-2 channel-fused polydot vs the per-channel composition."""
    import jax.numpy as jnp

    from agilex_ntt_tpu import RNSRing
    from agilex_ntt_tpu.ops import ntt_kernel as K

    n, L, kk, B = 256, 3, 2, 8
    rns = RNSRing(n, num_primes=L, backend="xla")  # composed oracle
    params_tuple = tuple(r.params for r in rns.rings)
    a = np.stack([
        rng.integers(0, r.q, size=(B, kk, n), dtype=np.uint32)
        for r in rns.rings
    ])
    b = np.stack([
        rng.integers(0, r.q, size=(B, kk, n), dtype=np.uint32)
        for r in rns.rings
    ])
    got = np.asarray(
        K.polydot_rns_fused(
            jnp.asarray(a), jnp.asarray(b), params_tuple,
            scales=tuple(r.polymul_scale for r in rns.rings),
            qinv_negs=tuple(r.qinv_neg for r in rns.rings),
            interpret=True,
        )
    )
    want = np.asarray(rns.polydot(a, b))
    assert (got == want).all()
