#!/usr/bin/env python
"""A/B: MXU limb-decomposed matmul four-step vs the Pallas/VPU four-step.

VERDICT round-2 item 1.  Prints one JSON line per measurement:
full-transform fwd NTT at n in {2^16, 2^18, 2^20} (both paths flat-to-flat,
so the comparison includes identical relayout costs), plus the column pass
alone at matched (B, n1, n2) tiles.  The adopt/keep decision and numbers go
to BASELINE.md ("MXU A/B").

Run on the real chip: `python tools/ab_mxu.py`; `--smoke` runs tiny shapes
(any platform) as a wiring check.
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from agilex_ntt_tpu.ops import fourstep, mxu_ntt  # noqa: E402
from agilex_ntt_tpu.params import find_primes  # noqa: E402
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
    key = jax.random.PRNGKey(0)
    sizes = ((12, 64, 4),) if smoke else ((16, 512, 10), (18, 128, 8), (20, 32, 6))

    for ln, B, iters in sizes:
        n = 1 << ln
        q = find_primes(n, 1)[0]
        plan = fourstep.make_plan(n, q)
        x = jax.random.randint(key, (B, n), 0, q, dtype=jnp.uint32)

        t_vpu = best(
            lambda v: fourstep.fwd_ntt_fourstep(
                v, plan, backend="pallas" if on_tpu else "xla"
            ),
            x, iters,
        )
        line(f"fwd four-step VPU NTT/s (n=2^{ln}, B={B})",
             round(B / t_vpu, 1), "NTT/s")

        t_mxu = best(lambda v: mxu_ntt.fwd_ntt_fourstep_mxu(v, plan), x, iters)
        line(f"fwd four-step MXU NTT/s (n=2^{ln}, B={B})",
             round(B / t_mxu, 1), "NTT/s", round(t_vpu / t_mxu, 3))

        if smoke:
            continue
        # column pass alone at the matched tile (isolates the matmul itself
        # from the inter-pass scale + row pass)
        xt = x.reshape(B, plan.n1, plan.n2)
        col_vpu = jax.jit(
            lambda v: fourstep._col_pass_fwd(v, plan, interpret=not on_tpu)
        )
        t_colv = best(col_vpu, xt, iters)
        t_colm = best(lambda v: mxu_ntt.fwd_col_pass_mxu(v, plan), xt, iters)
        line(f"col pass MXU vs VPU speedup (n=2^{ln})",
             round(t_colv / t_colm, 3), "x")


if __name__ == "__main__":
    main()
