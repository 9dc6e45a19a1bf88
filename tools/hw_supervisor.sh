#!/usr/bin/env bash
# Resilient round-5 measurement supervisor.  The axon tunnel drops
# intermittently, and any process that dials during an outage hangs
# FOREVER (threads futex-parked, ~0 CPU) even after the tunnel recovers —
# so every TPU step here (a) waits for a live tunnel first, (b) runs under
# timeout, (c) retries (fresh process) if it exited without producing
# output.  Steps with non-empty .out are skipped, so the script is
# idempotent and safe to re-run.
set -u
cd "$(dirname "$0")/.."
mkdir -p report_out/hw_r5
LOG=report_out/hw_r5_driver.log

say() { echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"; }

tunnel_up() {
  timeout 120 python -c "import jax; jax.devices(); import jax.numpy as j; j.arange(4).sum().block_until_ready()" >/dev/null 2>&1
}

wait_tunnel() {
  local i=0
  until tunnel_up; do
    i=$((i + 1))
    say "tunnel down (probe $i failed); sleeping 300s"
    sleep 300
    if [ "$i" -ge 24 ]; then say "tunnel never recovered"; return 1; fi
  done
  return 0
}

# step <name> <tmo> <needs_tunnel 0|1> <cmd...>
step() {
  local name=$1 tmo=$2 needs=$3; shift 3
  if [ -s "report_out/hw_r5/$name.out" ]; then
    say "$name: already has output, skipping"
    return 0
  fi
  local try
  for try in 1 2 3; do
    if [ "$needs" = 1 ]; then wait_tunnel || return 1; fi
    say "$name try $try: $*"
    timeout "$tmo" "$@" > "report_out/hw_r5/$name.out" 2> "report_out/hw_r5/$name.err"
    say "$name try $try: exit $?"
    [ -s "report_out/hw_r5/$name.out" ] && return 0
  done
  say "$name: no output after 3 tries"
  return 1
}

step suite       7200 1 python -u tools/bench_suite.py
step ab_passes   3600 1 python -u tools/ab_flat_passes.py
step tune_ks     3600 1 python -u -m agilex_ntt_tpu.utils.autotune 4096 512 --op keyswitch --L 3 --dnum 3 --refresh
step test_hw     7200 1 make test_hw
step cpu_pytest 14400 0 python -m pytest tests/ -q
say "supervisor complete"
