#!/usr/bin/env bash
# Watch for the TPU tunnel to come back, then run the round-3 hardware
# measurement sequence (tools/hw_round3.sh). Poll is a 90 s-bounded
# jax.devices() probe; when the tunnel is down the probe hangs and the
# timeout fires. Logs to report_out/hw_r3/watch.log.
set -u
cd "$(dirname "$0")/.."
mkdir -p report_out/hw_r3
LOG=report_out/hw_r3/watch.log
echo "watch start $(date +%F' '%T)" >>"$LOG"
while true; do
  if timeout 90 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "tunnel UP $(date +%F' '%T) — launching hw_round3.sh" >>"$LOG"
    break
  fi
  echo "tunnel still down $(date +%F' '%T)" >>"$LOG"
  sleep 240
done
bash tools/hw_round3.sh >>report_out/hw_r3/run.log 2>&1
echo "hw_round3 done $(date +%F' '%T)" >>"$LOG"
