#!/usr/bin/env python
"""A/B: flat-layout fused four-step kernels vs the tiled path + relayouts.

VERDICT round-2 weak item 3: flat-API four-step calls pay a rank-2 <-> rank-3
HBM relayout per boundary (~0.87 ms per in+out pair at 128 MB), giving back
~20% end-to-end at n = 2^16 (126.9 K vs 158 K kernel-only fwd NTT/s).  The
tiled-domain API recovers it for chained callers; ``ops/flat_fuse.py``
removes it for flat callers by running both passes on the flat block.  This
tool prices all three on hardware:

  flat-API tiled   reshape -> tiled full-fuse kernel -> reshape (production)
  flat kernel      the new single flat-layout kernel, no relayouts
  tiled kernel     kernel-only rate (the relayout-free ceiling)

for fwd, inv, and the fused polymul, at the production size n = 2^16.

Run on the real chip: `python tools/ab_flat.py`; `--smoke` for a wiring check.
"""

import json
import os
import sys

import jax

# --smoke is a device-free wiring check: force CPU before any backend use
# (env JAX_PLATFORMS does not stop the axon TPU plugin from dialing the
# tunnel — only the in-process config update does, see CLAUDE.md)
if "--smoke" in sys.argv and not os.environ.get("NTT_TPU_REAL_DEVICE"):
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import jax.numpy as jnp

sys.path.insert(0, ".")

from agilex_ntt_tpu.ops import flat_fuse, fourstep  # noqa: E402
from agilex_ntt_tpu.ops.modmul import mont_qinv_neg  # noqa: E402
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
    interpret = not on_tpu
    n, B, iters = (1024, 8, 2) if smoke else (65536, 512, 10)
    q = find_primes(n, 1)[0]
    plan = fourstep.make_plan(n, q)
    scale = plan.n_inv * ((1 << 32) % q) % q
    qinv_neg = mont_qinv_neg(q)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, n), 0, q, dtype=jnp.uint32)

    def tag(s):
        return f"{s} (n=2^{n.bit_length() - 1}, B={B})"

    # forward
    t_api = best(
        lambda v: fourstep.fwd_ntt_fourstep(v, plan, interpret=interpret),
        x, iters,
    )
    line(tag("fwd flat-API tiled NTT/s"), round(B / t_api, 1), "NTT/s")
    t_flat = best(
        lambda v: flat_fuse.fwd_ntt_fourstep_flat(v, plan, interpret=interpret),
        x, iters,
    )
    line(tag("fwd flat-kernel NTT/s"), round(B / t_flat, 1), "NTT/s",
         round(t_api / t_flat, 3))
    x3 = x.reshape(B, plan.n1, plan.n2)
    t_kern = best(
        lambda v: fourstep.fwd_ntt_fourstep_tiled(v, plan, interpret=interpret),
        x3, iters,
    )
    line(tag("fwd tiled-kernel NTT/s"), round(B / t_kern, 1), "NTT/s",
         round(t_api / t_kern, 3))

    # inverse
    t_api = best(
        lambda v: fourstep.inv_ntt_fourstep(v, plan, interpret=interpret),
        x, iters,
    )
    line(tag("inv flat-API tiled NTT/s"), round(B / t_api, 1), "NTT/s")
    t_flat = best(
        lambda v: flat_fuse.inv_ntt_fourstep_flat(v, plan, interpret=interpret),
        x, iters,
    )
    line(tag("inv flat-kernel NTT/s"), round(B / t_flat, 1), "NTT/s",
         round(t_api / t_flat, 3))

    # fused polymul (cap: matrix <= 2 MiB, holds at n = 2^16)
    t_api = best(
        lambda v: fourstep.polymul_fourstep_fused(
            v, v, plan, scale=scale, qinv_neg=qinv_neg, interpret=interpret
        ),
        x, max(4, iters // 2),
    )
    line(tag("polymul flat-API tiled op/s"), round(B / t_api, 1), "op/s")
    # the flat polymul at this size may be rejected by the byte-aware VMEM
    # guard (round 5: it OOM'd the Mosaic allocator at n=2^16/block_rows=8,
    # and 8 is the minimum legal block height) — record the clean rejection
    # and price the Ring-level fallback instead of crashing the A/B
    try:
        t_flat = best(
            lambda v: flat_fuse.polymul_fourstep_flat(
                v, v, plan, scale=scale, qinv_neg=qinv_neg,
                interpret=interpret,
            ),
            x, max(4, iters // 2),
        )
        line(tag("polymul flat-kernel op/s"), round(B / t_flat, 1), "op/s",
             round(t_api / t_flat, 3))
    except ValueError as e:
        line(tag("polymul flat-kernel op/s REJECTED by VMEM guard"),
             None, "op/s")
        print(f"guard: {e}", file=sys.stderr)
    from agilex_ntt_tpu import Ring

    rflat = Ring(n, q, method="fourstep", backend="pallas",
                 fourstep_kernel="flat", interpret=interpret)
    t_ring = best(lambda v: rflat.polymul(v, v), x, max(4, iters // 2))
    line(tag("polymul via Ring(fourstep_kernel='flat') op/s (guarded "
             "dispatch, falls back to tiled when flat cannot fit)"),
         round(B / t_ring, 1), "op/s", round(t_api / t_ring, 3))


if __name__ == "__main__":
    main()
