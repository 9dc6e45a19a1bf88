#!/usr/bin/env python
"""A/B: overlapped vs ppermute sp exchange — STAGED for a multi-chip pod.

On a pod slice (>= 2 chips on one ICI domain) this measures the
coefficient-sharded transform both ways:

  * stage method:   ppermute whole-shard exchange  vs  chunked Pallas RDMA
                    streaming the partner shard behind the butterflies
                    (parallel/overlap.py)
  * fourstep method: monolithic all-to-all retiles  vs  batch-chunked
                    pipeline whose retiles XLA overlaps with compute

Single-chip hardware cannot run either comparison (the exchange needs a
real ICI hop) — on this environment's 1-chip tunnel the script prints a
skip record instead of fabricating numbers (BASELINE.md round-1 lesson:
never report what was not measured).

Usage on a pod slice:  python tools/ab_overlap.py [n] [batch]
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from agilex_ntt_tpu import Ring  # noqa: E402
from agilex_ntt_tpu.parallel import ShardedRing, make_mesh  # noqa: E402
from agilex_ntt_tpu.utils.profiling import (  # noqa: E402
    device_time,
    device_time_profiled,
)


def measure(sr, x):
    t = device_time_profiled(sr.ntt, x, iters=8)
    if t is None:
        t = device_time(sr.ntt, x, iters=8)
    return t


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 15
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    devs = jax.devices()
    if devs[0].platform != "tpu" or len(devs) < 2:
        print(json.dumps({
            "metric": "overlap-vs-ppermute A/B",
            "value": None,
            "unit": "skipped",
            "vs_baseline": None,
            "reason": f"needs >=2 TPU chips on ICI, have "
                      f"{len(devs)} {devs[0].platform}",
        }))
        return 0
    mesh = make_mesh(sp=len(devs))
    ring = Ring(n)
    x = jax.random.randint(
        jax.random.PRNGKey(0), (batch, n), 0, ring.q, dtype=jnp.uint32
    )
    rows = []
    if ring.method != "fourstep":
        for comm in ("ppermute", "overlap"):
            sr = ShardedRing(
                ring, mesh, dp_axis=None, sp_axis="sp",
                sp_method="stage", sp_comm=comm,
            )
            rows.append(("stage/" + comm, measure(sr, x)))
    fring = Ring(n, method="fourstep") if ring.method != "fourstep" else ring
    for comm in ("ppermute", "overlap"):
        sr = ShardedRing(
            fring, mesh, dp_axis=None, sp_axis="sp",
            sp_method="fourstep", sp_comm=comm,
        )
        rows.append(("fourstep/" + comm, measure(sr, x)))
    for name, t in rows:
        print(json.dumps({
            "metric": f"sharded fwd NTT [{name}] (n={n}, b={batch}, "
                      f"P={len(devs)})",
            "value": round(batch / t, 1),
            "unit": "NTT/s",
            "vs_baseline": None,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
