"""Static per-kernel analysis report — the TPU analog of `make report`.

The reference's report flow does a partial hardware compile and emits
``fpga_report.prj/reports/report.html`` with II / occupancy / RAM-banking
analysis (``/root/reference/Makefile:26,38-39``, ``README.md:28-32``); its
kernel attributes exist mainly to make that report clean (SURVEY.md §5).
Here the same role is played by the XLA AOT pipeline: for each transform
size we lower + compile the forward/inverse kernels, dump the optimized HLO,
pull XLA's cost analysis, and derive the roofline position (arithmetic
intensity vs the VPU int-op and HBM-bandwidth ceilings).

Run: ``python -m agilex_ntt_tpu.utils.report [n ...]``  (writes report_out/).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

# Per-chip ceilings used for the roofline derivation.  TPU v5e estimates:
# HBM bandwidth ~819 GB/s; VPU integer lanes 8x128 at ~940 MHz with ~4
# vector ALU issues/cycle -> ~3.9e12 32-bit int ops/s.  These are derivation
# constants (clearly labeled in the output), not measurements — the measured
# counterpart is tools/roofline.py.
HBM_GBPS = 819.0
VPU_INT_OPS = 3.9e12

# ops per element per stage in the positional butterfly (count of uint32
# vector ALU ops in fwd_stage_step + partner rolls: 4 mul + ~10 add/shift
# in the two mulhi ladders, plus selects/compares/adds)
OPS_PER_ELEM_STAGE = 25


def _fmt(v: float) -> str:
    for unit in ("", "K", "M", "G", "T", "P"):
        if abs(v) < 1000:
            return f"{v:7.2f}{unit}"
        v /= 1000
    return f"{v:.2f}E"


def kernel_report(n: int, batch: int = 512, out_dir: str = "report_out"):
    """Compile fwd+inv for one size; dump HLO and return an analysis dict."""
    from ..api import Ring

    os.makedirs(out_dir, exist_ok=True)
    ring = Ring(n)
    x = jnp.zeros((batch, n), dtype=jnp.uint32)

    rows = []
    for name, fn in (("fwd", ring.ntt), ("inv", ring.intt)):
        lowered = jax.jit(fn).lower(x)
        compiled = lowered.compile()
        hlo_path = os.path.join(out_dir, f"ntt_{name}_n{n}.hlo.txt")
        with open(hlo_path, "w") as f:
            f.write(compiled.as_text())
        try:
            cost = compiled.cost_analysis() or {}
        except Exception:
            cost = {}
        mem = compiled.memory_analysis()

        logn = n.bit_length() - 1
        elems = batch * n
        model_ops = OPS_PER_ELEM_STAGE * elems * logn
        min_bytes = 2 * 4 * elems  # read input + write output once
        intensity = model_ops / min_bytes
        ridge = VPU_INT_OPS / (HBM_GBPS * 1e9)
        bound = "compute" if intensity > ridge else "memory"
        t_compute = model_ops / VPU_INT_OPS
        t_memory = min_bytes / (HBM_GBPS * 1e9)
        t_bound = max(t_compute, t_memory)
        rows.append(
            dict(
                name=name,
                n=n,
                batch=batch,
                method=ring.method,
                hlo=hlo_path,
                xla_flops=cost.get("flops", float("nan")),
                xla_bytes=cost.get("bytes accessed", float("nan")),
                model_ops=model_ops,
                min_bytes=min_bytes,
                intensity=intensity,
                ridge=ridge,
                bound=bound,
                sol_ntts_per_s=batch / t_bound,
                peak_vmem_bytes=getattr(
                    mem, "temp_size_in_bytes", float("nan")
                ),
            )
        )
    return rows


def main(argv=None):
    sizes = [int(a) for a in (argv or sys.argv[1:])] or [1024, 4096, 16384]
    out_dir = "report_out"
    all_rows = []
    for n in sizes:
        all_rows += kernel_report(n, out_dir=out_dir)

    hdr = (
        f"{'kernel':>10} {'n':>7} {'method':>9} {'model ops':>10} "
        f"{'min bytes':>10} {'AI':>7} {'bound':>8} {'SoL NTT/s':>10}"
    )
    lines = [
        "per-kernel roofline report (derivation constants: "
        f"HBM={HBM_GBPS:.0f} GB/s, VPU={VPU_INT_OPS:.2e} int-ops/s, "
        f"{OPS_PER_ELEM_STAGE} ops/elem/stage)",
        hdr,
        "-" * len(hdr),
    ]
    for r in all_rows:
        lines.append(
            f"{r['name']:>10} {r['n']:>7} {r['method']:>9} "
            f"{_fmt(r['model_ops']):>10} {_fmt(r['min_bytes']):>10} "
            f"{r['intensity']:7.1f} {r['bound']:>8} "
            f"{_fmt(r['sol_ntts_per_s']):>10}"
        )
        lines.append(
            f"{'':>10} xla flops={_fmt(r['xla_flops'])} "
            f"xla bytes={_fmt(r['xla_bytes'])} hlo={r['hlo']}"
        )
    text = "\n".join(lines)
    print(text)
    with open(os.path.join(out_dir, "report.txt"), "w") as f:
        f.write(text + "\n")


if __name__ == "__main__":
    main()
