#!/usr/bin/env bash
# Round-5 follow-up hardware steps (run after tools/hw_round5.sh):
# the flat-kernel pass breakdown (VERDICT item 7) and the scheme-op
# autotune rows (item 8).  Same conventions as hw_round5.sh.
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

TMO=3600 run ab_passes   python -u tools/ab_flat_passes.py
TMO=3600 run tune_scheme python -u -m agilex_ntt_tpu.utils.autotune 4096 512 --op scheme --L 3 --dnum 3 --refresh
echo "=== follow-up steps done"
