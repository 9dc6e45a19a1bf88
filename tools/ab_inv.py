#!/usr/bin/env python
"""A/B: descending-stride (DIT-form) inverse NTT vs the production GS inverse.

VERDICT round-2 item 6.  The GS inverse's ascending stride order measures
~11% slower than the forward kernel's descending order at equal op count
(BASELINE.md); ops/dit_inv.py derives the only descending-stride inverse
formulation (2 bitrev gathers + 2 fused scale passes) and this tool prices
it on hardware.  Also times each bitrev-permute implementation alone so the
overhead decomposes.

Run on the real chip: `python tools/ab_inv.py`; `--smoke` for a wiring check.
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from agilex_ntt_tpu import api  # noqa: E402
from agilex_ntt_tpu.ops import dit_inv  # noqa: E402
from agilex_ntt_tpu.params import find_primes, make_params  # noqa: E402
from agilex_ntt_tpu.utils.profiling import (  # noqa: E402
    device_time,
    device_time_profiled,
)


def best(fn, x, iters):
    t = device_time_profiled(fn, x, iters=min(iters, 8))
    if t is not None:
        return t
    return min(device_time(fn, x, iters=iters) for _ in range(3))


def line(metric, value, unit, vs=None):
    print(json.dumps(
        {"metric": metric, "value": value, "unit": unit, "vs_baseline": vs},
    ), flush=True)


def main():
    smoke = "--smoke" in sys.argv
    on_tpu = jax.devices()[0].platform == "tpu"
    interpret = not on_tpu
    n, B, iters = (256, 8, 2) if smoke else (4096, 8192, 12)
    q = find_primes(n, 1)[0]
    p = make_params(n, q)
    ring = api.Ring(n, q)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, n), 0, q, dtype=jnp.uint32)
    X = ring.ntt(x)

    t_gs = best(ring.intt, X, iters)
    line(f"inv GS NTT/s (n={n}, B={B})", round(B / t_gs, 1), "NTT/s")

    for fac in (False, True):
        name = "factored" if fac else "direct"
        t_dit = best(
            lambda v: dit_inv.inv_ntt_dit(
                v, p, interpret=interpret, factored=fac
            ),
            X, iters,
        )
        line(f"inv DIT+{name}-bitrev NTT/s (n={n}, B={B})",
             round(B / t_dit, 1), "NTT/s", round(t_gs / t_dit, 3))
        # the permutation alone (x2: ingress + egress)
        perm = jax.jit(lambda v: dit_inv.bitrev_permute(v, factored=fac))
        t_perm = best(perm, X, iters)
        line(f"one bitrev permute {name} (n={n}, B={B})",
             round(t_perm * 1e3, 4), "ms")


if __name__ == "__main__":
    main()
