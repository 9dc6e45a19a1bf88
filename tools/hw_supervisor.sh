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

# cpu_secs <pid>: cumulative CPU seconds of a process
cpu_secs() { awk '{print int(($14 + $15) / 100)}' "/proc/$1/stat" 2>/dev/null || echo 0; }

# step <name> <tmo> <needs_tunnel 0|1> <cmd...>
#
# Watchdog: a process that dials the tunnel during an outage window hangs
# FOREVER with frozen CPU (probing the tunnel immediately before launch
# does NOT protect — observed ab_passes hang 2s after a successful
# probe).  A legitimate remote-compile wait also sits at low CPU but its
# CPU still creeps; a hang is bit-frozen.  Rule: no stdout yet AND CPU
# growth < 2s across 8 consecutive minutes -> kill and retry.
step() {
  local name=$1 tmo=$2 needs=$3; shift 3
  if [ -s "report_out/hw_r5/$name.out" ]; then
    say "$name: already has output, skipping"
    return 0
  fi
  local try
  for try in 1 2 3 4; do
    if [ "$needs" = 1 ]; then
      # settle delay: every observed hang started within seconds of a
      # previous process exiting or being killed (fresh probes minutes
      # later always worked) — give the tunnel/server session time to
      # tear down before dialing
      sleep 90
      wait_tunnel || return 1
    fi
    say "$name try $try: $*"
    timeout "$tmo" "$@" > "report_out/hw_r5/$name.out" 2> "report_out/hw_r5/$name.err" &
    local tpid=$!
    local frozen=0 last_cpu=0 last_size=-1
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 60
      # find the python child of the timeout wrapper (fall back to tpid)
      local cpid cur size
      cpid=$(pgrep -P "$tpid" | head -1); cpid=${cpid:-$tpid}
      cur=$(cpu_secs "$cpid")
      size=$(stat -c %s "report_out/hw_r5/$name.out" 2>/dev/null || echo 0)
      if [ "$size" = "$last_size" ] && [ $((cur - last_cpu)) -lt 2 ]; then
        frozen=$((frozen + 1))
      else
        frozen=0
      fi
      last_cpu=$cur
      last_size=$size
      if [ "$frozen" -ge 8 ]; then
        say "$name try $try: WATCHDOG kill (no output, CPU frozen ${frozen}m)"
        kill "$cpid" "$tpid" 2>/dev/null
        sleep 3
        kill -9 "$cpid" "$tpid" 2>/dev/null
        break
      fi
    done
    wait "$tpid" 2>/dev/null
    say "$name try $try: exit $?"
    [ -s "report_out/hw_r5/$name.out" ] && return 0
  done
  say "$name: no output after 4 tries"
  return 1
}

step suite       7200 1 python -u tools/bench_suite.py
step ab_passes   3600 1 python -u tools/ab_flat_passes.py
# keyswitch tune: Pallas candidates only — the XLA candidate's graph
# compile reliably wedges through the tunnel (see tools/tune_ks_pallas.py)
step tune_ks     3600 1 python -u tools/tune_ks_pallas.py
step test_hw     7200 1 make test_hw
step cpu_pytest 14400 0 python -m pytest tests/ -q
say "supervisor complete"
