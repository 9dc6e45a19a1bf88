"""Tests for the traced vector-op census (utils/opcount.py) and the
profiler-based device timer — the round-2 roofline reconciliation machinery
(VERDICT.md round 1, item 1)."""

import jax
import jax.numpy as jnp
import pytest

from agilex_ntt_tpu.params import find_primes, make_params
from agilex_ntt_tpu.utils.opcount import ntt_alu_ops, op_census
from agilex_ntt_tpu.utils.profiling import device_time_profiled, under_trace


def test_op_census_counts_simple_ops():
    def f(x):
        return (x * jnp.uint32(3) + jnp.uint32(1)) ^ (x >> jnp.uint32(2))

    c = op_census(f, jax.ShapeDtypeStruct((8, 128), jnp.uint32))
    # mul, add, xor, shift = 4 ALU ops per element
    assert c["alu"] == 4 * 8 * 128
    assert c["other"] == 0


def test_op_census_recurses_into_jit():
    inner = jax.jit(lambda x: x + jnp.uint32(1))

    def f(x):
        return inner(inner(x))

    c = op_census(f, jax.ShapeDtypeStruct((8, 128), jnp.uint32))
    assert c["alu"] == 2 * 8 * 128


def test_op_census_roll_is_layout():
    def f(x):
        return jnp.roll(x, 5, axis=1)

    c = op_census(f, jax.ShapeDtypeStruct((8, 128), jnp.uint32))
    # jnp.roll traces as slices + concatenate: 2 element-touches per element
    assert c["layout"] == 2 * 8 * 128
    assert c["alu"] == 0


@pytest.mark.parametrize("direction", ["fwd", "inv"])
def test_ntt_census_in_expected_band(direction):
    params = make_params(1024, find_primes(1024, 1)[0])
    c = ntt_alu_ops(params, 16, direction=direction)
    per = c["per_elem_stage"]
    # the Harvey lazy butterfly with a 16-bit-limb mulhi ladder costs
    # ~24-30 ALU ops/elem/stage; a large drift in either direction means
    # the kernel arithmetic or the census itself changed — both need a
    # deliberate re-baseline (BASELINE.md)
    assert 20 <= per["alu"] <= 33, per
    assert per["layout"] == pytest.approx(4.0)  # 2 rolls (2 touches each)
    assert c["issue_ops_per_elem_stage"] == pytest.approx(per["alu"] + 2.0)
    assert per["other"] == 0.0  # nothing uncategorized in the hot path


def test_fwd_census_exceeds_inv():
    # fwd carries the final-stage correction to [0, q); inv folds its
    # scaling into the last stage's twiddle row
    params = make_params(1024, find_primes(1024, 1)[0])
    fwd = ntt_alu_ops(params, 16, direction="fwd")
    inv = ntt_alu_ops(params, 16, direction="inv")
    assert fwd["alu"] > inv["alu"]


def test_under_trace():
    assert not under_trace()
    seen = []

    def f(x):
        seen.append(under_trace())
        return x

    jax.jit(f)(jnp.zeros(()))
    assert seen == [True]
    assert not under_trace()


def test_under_trace_fallback(monkeypatch):
    # If a JAX upgrade removes the private trace_ctx attribute, under_trace
    # must fall back to the behavioral Tracer probe, not crash or silently
    # report "not traced".
    monkeypatch.delattr(jax.core, "trace_ctx")
    assert not under_trace()
    seen = []

    def f(x):
        seen.append(under_trace())
        return x

    jax.jit(f)(jnp.zeros(()))
    assert seen == [True]


def test_device_time_profiled_fallback_or_value():
    params = make_params(256, find_primes(256, 1)[0])
    from agilex_ntt_tpu.ops import xla_ntt

    x = jnp.zeros((8, 256), dtype=jnp.uint32)
    t = device_time_profiled(lambda v: xla_ntt.fwd_ntt_xla(v, params), x,
                             iters=2)
    # CPU runs have no TPU device events -> None (callers fall back to the
    # wall-clock delta method); a TPU run must return a positive time
    assert t is None or t > 0
