"""Static per-kernel analysis report — the TPU analog of `make report`.

The reference's report flow does a partial hardware compile and emits
``fpga_report.prj/reports/report.html`` with II / occupancy / RAM-banking
analysis (``/root/reference/Makefile:26,38-39``, ``README.md:28-32``); its
kernel attributes exist mainly to make that report clean (SURVEY.md §5).
Here the same role is played by the XLA AOT pipeline: for each transform
size we lower + compile the forward/inverse kernels, dump the optimized HLO,
and derive the roofline position (arithmetic intensity vs the VPU issue-rate
and HBM-bandwidth ceilings).

The op model is machine-derived, not hand-estimated: ``utils/opcount``
traces the exact stage chain the kernel executes and counts element-weighted
vector ops (round 1 hardcoded "25 ops/elem/stage", which understated the
real count of ~30.5 ALU + 2 rotate ops and made the derived speed-of-light
sit *below* measurement; see VERDICT.md round 1).

Run: ``python -m agilex_ntt_tpu.utils.report [n ...]``  (writes report_out/).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

# Per-chip ceilings used for the roofline derivation (clearly labeled in the
# output as derivation constants; the measured counterpart is
# tools/roofline.py):
#
#   * HBM bandwidth: 819 GB/s (public TPU v5e spec).
#   * VPU issue rate: the v5e TensorCore clock derived from its public bf16
#     peak (197 TFLOP/s = 2 * 128*128 * 4 MXUs * f  =>  f ~ 1.50 GHz) times
#     the VPU's 8x128 lanes * 4 ALUs  =>  ~6.15e12 vector ops/s.  Cross-
#     checked on the live chip: the fwd NTT kernel itself sustains ~5.7e12
#     issued ops/s (profiler device time x traced op census, 2026-08-16),
#     which no ceiling below ~5.7e12 could admit.
HBM_GBPS = 819.0
VPU_ISSUE_OPS = 6.15e12


def _fmt(v: float) -> str:
    if v != v:  # NaN: XLA's cost hook returns no flops for integer kernels
        return "    n/a"
    for unit in ("", "K", "M", "G", "T", "P"):
        if abs(v) < 1000:
            return f"{v:7.2f}{unit}"
        v /= 1000
    return f"{v:.2f}E"


def kernel_report(n: int, batch: int = 512, out_dir: str = "report_out"):
    """Compile fwd+inv for one size; dump HLO and return an analysis dict."""
    from ..api import Ring
    from .opcount import ntt_alu_ops

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
        if ring.method == "radix2":
            census = ntt_alu_ops(ring.params, batch, direction=name)
            ops_per_es = census["issue_ops_per_elem_stage"]
            ops_note = "traced"
        else:
            # four-step rings run the same stage math over n1xn2 passes plus
            # one twiddle-scale pass between them; model as radix-2 issue ops
            # at a small surrogate size + one extra mulmod pass (~20 ops/elem)
            from ..params import make_params

            sur = make_params(4096, ring.q) if ring.q % 8192 == 1 else None
            if sur is not None:
                census = ntt_alu_ops(sur, 8, direction=name)
                ops_per_es = census["issue_ops_per_elem_stage"]
            else:
                ops_per_es = 32.5
            ops_per_es += 20.0 / logn  # inter-pass twiddle scale, amortized
            ops_note = "traced(surrogate)+scale"
        model_ops = ops_per_es * elems * logn
        min_bytes = 2 * 4 * elems  # read input + write output once
        intensity = model_ops / min_bytes
        ridge = VPU_ISSUE_OPS / (HBM_GBPS * 1e9)
        bound = "compute" if intensity > ridge else "memory"
        t_compute = model_ops / VPU_ISSUE_OPS
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
                ops_per_elem_stage=ops_per_es,
                ops_note=ops_note,
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
        f"{'kernel':>10} {'n':>7} {'method':>9} {'ops/e/s':>8} {'model ops':>10} "
        f"{'min bytes':>10} {'AI':>7} {'bound':>8} {'SoL NTT/s':>10}"
    )
    lines = [
        "per-kernel roofline report (derivation constants: "
        f"HBM={HBM_GBPS:.0f} GB/s, VPU={VPU_ISSUE_OPS:.2e} issue-ops/s; "
        "op model traced via utils.opcount)",
        hdr,
        "-" * len(hdr),
    ]
    for r in all_rows:
        lines.append(
            f"{r['name']:>10} {r['n']:>7} {r['method']:>9} "
            f"{r['ops_per_elem_stage']:8.2f} "
            f"{_fmt(r['model_ops']):>10} {_fmt(r['min_bytes']):>10} "
            f"{r['intensity']:7.1f} {r['bound']:>8} "
            f"{_fmt(r['sol_ntts_per_s']):>10}"
        )
        lines.append(
            f"{'':>10} xla flops={_fmt(r['xla_flops'])} "
            f"xla bytes={_fmt(r['xla_bytes'])} ops={r['ops_note']} "
            f"hlo={r['hlo']}"
        )
    text = "\n".join(lines)
    print(text)
    with open(os.path.join(out_dir, "report.txt"), "w") as f:
        f.write(text + "\n")


if __name__ == "__main__":
    main()
