"""Randomized sharded-path properties (hypothesis over mesh/size/strategy).

Every combination of sharding strategy, mesh factorization, and transform
size must stay bit-identical to the single-chip golden model.
"""

import jax
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from agilex_ntt_tpu import Ring
from agilex_ntt_tpu import golden as G
from agilex_ntt_tpu.parallel import ShardedRing, make_mesh


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@settings(max_examples=10, deadline=None)
@given(
    n=st.sampled_from([512, 1024, 4096]),
    sp=st.sampled_from([2, 4]),
    with_dp=st.booleans(),
    method=st.sampled_from(["stage", "fourstep"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_sharded_ntt_always_matches_golden(n, sp, with_dp, method, seed):
    ring = Ring(n, backend="xla")
    dp = 8 // sp if with_dp else None
    mesh = make_mesh(**({"dp": dp, "sp": sp} if dp else {"sp": sp}))
    sr = ShardedRing(
        ring, mesh, dp_axis="dp" if dp else None, sp_axis="sp",
        sp_method=method,
    )
    rng = np.random.default_rng(seed)
    b = 2 * (dp or 1)
    x = rng.integers(0, ring.q, size=(b, n), dtype=np.uint32)
    got = np.asarray(sr.ntt(sr.shard(x)))
    assert (got == G.fwd_ntt_u32(x, ring.params)).all()
    back = np.asarray(sr.intt(sr.ntt(sr.shard(x))))
    assert (back == x).all()
