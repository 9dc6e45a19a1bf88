"""MXU limb-decomposed matmul NTT (ops/mxu_ntt.py) — VERDICT round-2 item 1.

Bit-exactness against the standard four-step path; the perf A/B runs on
hardware via tools/ab_mxu.py and is recorded in BASELINE.md.
"""

import numpy as np
import pytest

from agilex_ntt_tpu.ops import fourstep, mxu_ntt
from agilex_ntt_tpu.params import find_primes


@pytest.fixture(scope="module")
def plan():
    n = 4096
    return fourstep.make_plan(n, find_primes(n, 1)[0])


def test_balanced_digits_roundtrip(rng):
    import jax.numpy as jnp

    v = rng.integers(0, 1 << 30, size=4096, dtype=np.uint32)
    v[:3] = [0, 1, (1 << 30) - 1]
    digits = mxu_ntt._balanced_digits(jnp.asarray(v))
    back = sum(
        np.asarray(d).astype(np.int64) << (8 * k)
        for k, d in enumerate(digits)
    )
    assert (back == v.astype(np.int64)).all()
    nd = mxu_ntt._balanced_digits_np(v)
    assert all(
        (np.asarray(digits[k]) == nd[k]).all() for k in range(mxu_ntt.DIGITS)
    )


def test_mxu_fourstep_matches_standard(plan, rng):
    import jax.numpy as jnp

    # lazy [0, 4q) inputs: the widest range the standard path accepts
    hi = min(4 * plan.q, (1 << 32)) - 1
    x = rng.integers(0, hi, size=(4, plan.n), dtype=np.uint32)
    want = np.asarray(
        fourstep.fwd_ntt_fourstep(jnp.asarray(x), plan, backend="xla")
    )
    got = np.asarray(mxu_ntt.fwd_ntt_fourstep_mxu(jnp.asarray(x), plan))
    assert (got == want).all()


def test_mxu_col_pass_matches(plan, rng):
    import jax.numpy as jnp

    n1, n2 = plan.n1, plan.n2
    x = rng.integers(0, plan.q, size=(2, n1, n2), dtype=np.uint32)
    got = np.asarray(mxu_ntt.fwd_col_pass_mxu(jnp.asarray(x), plan))
    # oracle: the flat column pass (transpose -> size-n1 negacyclic -> back)
    from agilex_ntt_tpu import golden as G

    xc = x.transpose(0, 2, 1).reshape(2 * n2, n1)
    yc = G.fwd_ntt_u32(xc, plan.col)
    want = yc.reshape(2, n2, n1).transpose(0, 2, 1)
    assert (got == want).all()


def test_mxu_cyclic_plan(rng):
    """The cyclic-plan branch of the column matrix (omega^...(bitrev k) r)."""
    import jax.numpy as jnp

    from agilex_ntt_tpu import CyclicRing

    n = 4096
    ring = CyclicRing(n, backend="xla")
    plan = fourstep.make_cyclic_plan(n, ring.q, ring.omega)
    x = rng.integers(0, ring.q, size=(2, n), dtype=np.uint32)
    want = np.asarray(ring.ntt(x))
    got = np.asarray(mxu_ntt.fwd_ntt_fourstep_mxu(jnp.asarray(x), plan))
    assert (got == want).all()
