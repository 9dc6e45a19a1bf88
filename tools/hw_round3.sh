#!/usr/bin/env bash
# Round-3 hardware measurement sequence (run when the TPU tunnel is up).
# Each step logs to report_out/hw_r3/; steps are independent — a failure
# (e.g. a tunnel blip) skips to the next, and the script can be re-run.
set -u
cd "$(dirname "$0")/.."
mkdir -p report_out/hw_r3
run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S))"
  timeout "$TMO" "$@" >"report_out/hw_r3/$name.out" 2>"report_out/hw_r3/$name.err"
  echo "=== $name: exit $? ($(date +%H:%M:%S))"
}

TMO=${TMO_OPCOST:-1800}  run opcost   python tools/opcost.py --write
TMO=1200                 run roofline python tools/roofline.py
TMO=3600                 run ab_mxu   python tools/ab_mxu.py
TMO=1800                 run ab_inv   python tools/ab_inv.py
TMO=3600                 run ab_flat  python tools/ab_flat.py
TMO=3600                 run tune64k  python -m agilex_ntt_tpu.utils.autotune 65536 512 --op all
TMO=1800                 run tune4k   python -m agilex_ntt_tpu.utils.autotune 4096 8192 --op all
TMO=3600                 run suite    python tools/bench_suite.py
TMO=3600                 run sweep    python tools/sweep.py
TMO=900                  run bench    python bench.py
TMO=2400                 run test_hw  make test_hw
echo "=== all measurement steps done; outputs in report_out/hw_r3/"
