"""Multi-chip tests on the 8-virtual-device CPU mesh (the analog of testing
multi-CU behavior in the FPGA emulator, SURVEY.md §4).

All sharded paths must be bit-identical to the single-chip golden model.
"""

import jax
import numpy as np
import pytest

from agilex_ntt_tpu import Ring
from agilex_ntt_tpu import golden as G
from agilex_ntt_tpu.parallel import (
    ShardedRing,
    dp_shard_batch,
    make_mesh,
    stage_sharded_fwd,
    stage_sharded_inv,
)

from conftest import params_for


@pytest.fixture(scope="module")
def devices8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()


def test_dp_ntt_matches_golden(devices8, rng):
    ring = Ring(256, backend="xla")
    mesh = make_mesh(dp=8)
    x = rng.integers(0, ring.q, size=(32, 256), dtype=np.uint32)
    xs = dp_shard_batch(x, mesh)
    sr = ShardedRing(ring, mesh, dp_axis="dp")
    got = np.asarray(sr.ntt(xs))
    assert (got == G.fwd_ntt_u32(x, ring.params)).all()
    back = np.asarray(sr.intt(sr.ntt(xs)))
    assert (back == x).all()


@pytest.mark.parametrize("num_sp", [2, 4, 8])
def test_stage_sharded_fwd_bitexact(devices8, rng, num_sp):
    n = 2048
    pp = params_for(n)
    mesh = make_mesh(sp=num_sp)
    x = rng.integers(0, pp.q, size=(8, n), dtype=np.uint32)
    got = np.asarray(stage_sharded_fwd(x, pp, mesh, axis="sp"))
    assert (got == G.fwd_ntt_u32(x, pp)).all()


@pytest.mark.parametrize("num_sp", [2, 8])
def test_stage_sharded_inv_bitexact(devices8, rng, num_sp):
    n = 2048
    pp = params_for(n)
    mesh = make_mesh(sp=num_sp)
    y = rng.integers(0, pp.q, size=(8, n), dtype=np.uint32)
    got = np.asarray(stage_sharded_inv(y, pp, mesh, axis="sp"))
    assert (got == G.inv_ntt_u32(y, pp)).all()


def test_stage_sharded_roundtrip(devices8, rng):
    n = 1024
    pp = params_for(n)
    mesh = make_mesh(sp=4)
    x = rng.integers(0, pp.q, size=(8, n), dtype=np.uint32)
    y = stage_sharded_fwd(x, pp, mesh, axis="sp")
    z = np.asarray(stage_sharded_inv(y, pp, mesh, axis="sp"))
    assert (z == x).all()


def test_dp_plus_sp_2d_mesh(devices8, rng):
    """Combined data + stage parallelism on a (dp=2, sp=4) mesh."""
    n = 1024
    ring = Ring(n, backend="xla")
    mesh = make_mesh(dp=2, sp=4)
    sr = ShardedRing(ring, mesh, dp_axis="dp", sp_axis="sp")
    x = rng.integers(0, ring.q, size=(16, n), dtype=np.uint32)
    xs = sr.shard(x)
    got = np.asarray(sr.ntt(xs))
    assert (got == G.fwd_ntt_u32(x, ring.params)).all()
    z = np.asarray(sr.intt(sr.ntt(xs)))
    assert (z == x).all()


def test_sharded_polymul(devices8, rng):
    n = 512
    ring = Ring(n, backend="xla")
    mesh = make_mesh(dp=2, sp=2)
    sr = ShardedRing(ring, mesh, dp_axis="dp", sp_axis="sp")
    a = rng.integers(0, ring.q, size=(4, n), dtype=np.uint32)
    b = rng.integers(0, ring.q, size=(4, n), dtype=np.uint32)
    got = np.asarray(sr.polymul(sr.shard(a), sr.shard(b)))
    want = np.asarray(ring.polymul(a, b))
    assert (got == want).all()


def test_stage_sharded_pallas_interpret(devices8, rng):
    """Local-stage suffix as a Pallas kernel (interpret mode) inside shard_map."""
    n = 1024
    pp = params_for(n)
    mesh = make_mesh(sp=2)
    x = rng.integers(0, pp.q, size=(8, n), dtype=np.uint32)
    got = np.asarray(
        stage_sharded_fwd(
            x, pp, mesh, axis="sp", use_pallas=True, interpret=True, block_rows=8
        )
    )
    assert (got == G.fwd_ntt_u32(x, pp)).all()


def test_sharded_cyclic_ring_dp(devices8, rng):
    """Round-2: ShardedRing now accepts CyclicRing (was a TypeError)."""
    from agilex_ntt_tpu import CyclicRing

    ring = CyclicRing(256, backend="xla")
    mesh = make_mesh(dp=8)
    sr = ShardedRing(ring, mesh, dp_axis="dp")
    x = rng.integers(0, ring.q, size=(16, 256), dtype=np.uint32)
    want = np.asarray(ring.ntt(x))
    got = np.asarray(sr.ntt(dp_shard_batch(x, mesh)))
    assert (got == want).all()
    a = rng.integers(0, ring.q, size=(16, 256), dtype=np.uint32)
    b = rng.integers(0, ring.q, size=(16, 256), dtype=np.uint32)
    assert (
        np.asarray(sr.polymul(a, b)) == np.asarray(ring.polymul(a, b))
    ).all()


def test_sharded_polydot_dp_fused(devices8, rng):
    """Round 3 (VERDICT round-2 item 4): ShardedRing.polydot under dp runs
    ONE shard_map over the single-kernel polydot, remainder batch included;
    bit-exact vs the single-chip op."""
    import jax.numpy as jnp

    n, k = 256, 3
    ring_i = Ring(n, backend="pallas", interpret=True)
    oracle = Ring(n, backend="xla")
    mesh = make_mesh(dp=8)
    sr = ShardedRing(ring_i, mesh, dp_axis="dp")
    a = rng.integers(0, ring_i.q, size=(13, k, n), dtype=np.uint32)
    b = rng.integers(0, ring_i.q, size=(13, k, n), dtype=np.uint32)
    got = np.asarray(sr.polydot(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(oracle.polydot(a, b))
    assert got.shape == (13, n)
    assert (got == want).all()


def test_sharded_polydot_dp_sp_composed(devices8, rng):
    """polydot with coefficient sharding: composed sharded transforms."""
    n, k = 512, 2
    ring = Ring(n, backend="xla")
    mesh = make_mesh(dp=2, sp=4)
    sr = ShardedRing(ring, mesh, dp_axis="dp", sp_axis="sp")
    a = rng.integers(0, ring.q, size=(4, k, n), dtype=np.uint32)
    b = rng.integers(0, ring.q, size=(4, k, n), dtype=np.uint32)
    got = np.asarray(sr.polydot(a, b))
    want = np.asarray(ring.polydot(a, b))
    assert (got == want).all()


def test_sharded_rotate_automorphism(devices8, rng):
    """Round 3: rotate/automorphism on the mesh (dp x sp), both domains."""
    n = 256
    ring = Ring(n, backend="xla")
    mesh = make_mesh(dp=4, sp=2)
    sr = ShardedRing(ring, mesh, dp_axis="dp", sp_axis="sp")
    x = rng.integers(0, ring.q, size=(8, n), dtype=np.uint32)
    xs = sr.shard(x)
    for k in (1, 5, 2 * n - 3):
        assert (
            np.asarray(sr.rotate(xs, k)) == np.asarray(ring.rotate(x, k))
        ).all()
    for k in (3, 5):
        for domain in ("coeff", "ntt"):
            got = np.asarray(sr.automorphism(xs, k, domain=domain))
            want = np.asarray(ring.automorphism(x, k, domain=domain))
            assert (got == want).all(), (k, domain)


@pytest.mark.parametrize("sp_method", ["stage", "fourstep"])
def test_sharded_cyclic_ring_sp(devices8, rng, sp_method):
    from agilex_ntt_tpu import CyclicRing

    n = 2048
    ring = CyclicRing(n, backend="xla")
    mesh = make_mesh(dp=2, sp=4)
    sr = ShardedRing(ring, mesh, dp_axis="dp", sp_axis="sp",
                     sp_method=sp_method)
    x = rng.integers(0, ring.q, size=(4, n), dtype=np.uint32)
    want = np.asarray(ring.ntt(x))
    got = np.asarray(sr.ntt(sr.shard(x)))
    assert (got == want).all()
    back = np.asarray(sr.intt(sr.shard(got)))
    assert (back == x).all()
