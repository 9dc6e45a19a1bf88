#!/usr/bin/env bash
# Round-5 hardware measurement sequence (run when the TPU tunnel is up).
# Each step logs to report_out/hw_r5/; steps are independent — a failure
# (e.g. a tunnel blip) skips to the next, and the script can be re-run.
# python -u everywhere: a timeout SIGTERM must not swallow buffered rows
# (what truncated round-3's sweep.out).
set -u
cd "$(dirname "$0")/.."
mkdir -p report_out/hw_r5
run() {
  name=$1; shift
  if [ -s "report_out/hw_r5/$name.out" ] && [ "${FORCE:-0}" != 1 ]; then
    echo "=== $name: already has output, skipping (FORCE=1 to re-run)"
    return
  fi
  echo "=== $name: $* (start $(date +%H:%M:%S))"
  timeout "$TMO" "$@" >"report_out/hw_r5/$name.out" 2>"report_out/hw_r5/$name.err"
  echo "=== $name: exit $? ($(date +%H:%M:%S))"
}

# task 1: the scheme/bench program post-broadcast-fix, rule-5 accounting live
TMO=5400 run suite    python -u tools/bench_suite.py
# task 3: flat polymul now byte-guarded — complete the 9-row A/B
TMO=5400 run ab_flat  python -u tools/ab_flat.py
# task 4: least-squares opcost weights, then the measured-weight roofline
TMO=2400 run opcost   python -u tools/opcost.py --write
TMO=1800 run roofline python -u tools/roofline.py
# task 2: the full 32..2^20 size table (round-3 run truncated at 8192)
TMO=7200 run sweep    python -u tools/sweep.py
# task 8: autotune incl. the repaired flat polymul candidate (--refresh:
# the round-3 cache would otherwise skip timing entirely)
TMO=5400 run tune64k  python -u -m agilex_ntt_tpu.utils.autotune 65536 512 --op all --refresh
TMO=1800 run tune4k   python -u -m agilex_ntt_tpu.utils.autotune 4096 8192 --op all --refresh
TMO=900  run bench    python -u bench.py
# task 5: on-chip suite pass count at the round-5 HEAD (run LAST, post-fixes)
TMO=3600 run test_hw  make test_hw
echo "=== all measurement steps done; outputs in report_out/hw_r5/"
