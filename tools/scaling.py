#!/usr/bin/env python
"""Multi-device scaling-efficiency sweep (BASELINE.md target: >= 85%).

Measures batched-NTT throughput on meshes of 1, 2, 4, ... devices and
reports parallel efficiency relative to the 1-device run.  On this
environment's single-chip TPU the sweep runs on virtual CPU devices (the
same `--xla_force_host_platform_device_count` mechanism the test suite
uses — the analog of the reference's multi-CU emulator flow); on a real pod
slice the same code measures true ICI scaling.

Each mesh size runs in a fresh subprocess because XLA fixes the device
count at backend initialization.

Prints one JSON line per mesh size plus a summary line (bench.py shape).
"""

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
import jax
P = int(sys.argv[1])
virtual = sys.argv[6] == "virtual"
if virtual:
    # not enough real devices: emulate P devices on the host CPU
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", P)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from agilex_ntt_tpu import Ring
from agilex_ntt_tpu.parallel import ShardedRing, dp_shard_batch, make_mesh
from agilex_ntt_tpu.utils.profiling import device_time

n = int(sys.argv[2])
per_dev_batch = int(sys.argv[3])
iters = int(sys.argv[4])
mode = sys.argv[5]  # dp | sp

ring = Ring(n, backend="xla" if virtual else None)
B = per_dev_batch * (P if mode == "dp" else 1)
x = jnp.asarray(
    np.random.default_rng(0).integers(0, ring.q, size=(B, n), dtype=np.uint32)
)
if P == 1:
    step = ring.ntt
else:
    mesh = make_mesh(**({"dp": P} if mode == "dp" else {"sp": P}))
    sr = (
        ShardedRing(ring, mesh, dp_axis="dp")
        if mode == "dp"
        else ShardedRing(ring, mesh, dp_axis=None, sp_axis="sp")
    )
    x = sr.shard(x)
    step = sr.ntt

# debiased delta timing shared with the rest of the tooling
per_call = device_time(step, x, iters=iters)
print(json.dumps({"P": P, "ntts_per_s": B / per_call}))
"""


def run_mesh(p: int, n: int, per_dev_batch: int, iters: int, mode: str,
             virtual: bool):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(p), str(n), str(per_dev_batch),
         str(iters), mode, "virtual" if virtual else "real"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    if out.returncode != 0:
        raise RuntimeError(f"P={p} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


# Per-link ICI bandwidth for the comm-volume model below (public v5e spec:
# 1600 Gbps/chip aggregate over 4 links => ~50 GB/s per direction per link).
ICI_GBPS = 50.0


def comm_model(mode: str, n: int, per_dev_batch: int, sizes):
    """Predicted per-device communication per transform for each sp
    strategy (VERDICT round-1 weak item 5: publish the model the >= 85%
    multi-host target rests on, so readers can sanity-check it).

    stage    : log2(P) ppermute hops, each moving the whole local shard
               => bytes/device = log2(P) * B * (n/P) * 4
    fourstep : 2 all-to-all retiles, each moving the (P-1)/P non-resident
               fraction of the local shard
               => bytes/device = 2 * (P-1)/P * B * (n/P) * 4
    For P >= 8, fourstep moves ~2/log2(P) of stage's volume — why the
    four-step strategy is the default for large meshes.
    """
    if mode != "sp":
        return
    import math

    B = per_dev_batch
    for p in sizes:
        if p == 1:
            continue
        shard = B * (n // p) * 4
        stage_bytes = int(math.log2(p)) * shard
        four_bytes = int(2 * (p - 1) / p * shard)
        print(json.dumps({
            "metric": f"sp comm model (n={n}, P={p}): bytes/device/transform "
                      f"[stage log2(P)*B*n/P*4 | fourstep 2(P-1)/P*B*n/P*4]; "
                      f"predicted ICI time at {ICI_GBPS:.0f} GB/s in "
                      "vs_baseline (us)",
            "value": [stage_bytes, four_bytes], "unit": "bytes",
            "vs_baseline": [
                round(stage_bytes / (ICI_GBPS * 1e3), 2),
                round(four_bytes / (ICI_GBPS * 1e3), 2),
            ],
        }))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "dp"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    per_dev_batch = 64
    iters = 4
    sizes = [1, 2, 4, 8]
    comm_model(mode, n, per_dev_batch, sizes)
    # workers measure on real devices only when the host actually has them;
    # otherwise they emulate on host CPU and the summary says so
    import jax

    virtual = not (
        jax.devices()[0].platform == "tpu" and len(jax.devices()) >= sizes[-1]
    )
    base = None
    results = []
    for p in sizes:
        r = run_mesh(p, n, per_dev_batch, iters, mode, virtual)
        rate = r["ntts_per_s"]
        if p == 1:
            base = rate
        # dp: ideal = base * P (weak scaling, per-device batch fixed)
        # sp: ideal = base (one transform spread over P devices, latency play)
        eff = rate / (base * p) if mode == "dp" else rate / base
        results.append((p, rate, eff))
        print(json.dumps({
            "metric": f"{mode} scaling (n={n}, P={p})",
            "value": round(rate, 1), "unit": "NTT/s",
            "vs_baseline": round(eff, 3),
        }))
    final = results[-1]
    print(json.dumps({
        "metric": (
            f"{mode} scaling efficiency at P={final[0]} (target >= 0.85 dp"
            + ("; VIRTUAL host-shared devices — all mesh sizes share one "
               "machine's compute, so weak-scaling efficiency ~1/P is the "
               "expected ceiling here; valid ICI numbers need a real pod slice"
               if virtual else "")
            + ")"
        ),
        "value": round(final[2], 3), "unit": "fraction",
        "vs_baseline": round(final[2] / 0.85, 2),
    }))


if __name__ == "__main__":
    main()
