"""Unit tests for the profiler trace-event accounting.

Pins the event-dedup rules of ``utils.profiling._trace_per_call_seconds``
against synthetic trace fixtures — specifically the nested module/op
double-count that shipped a 2.0x-low headline in round 3 (VERDICT.md round 3
weak-1: trace held BOTH ``jit_fwd_ntt`` and its nested ``fwd_ntt.1`` with
identical spans; summing every repeated name counted the same device
nanoseconds twice).  The reference has no runtime profiling at all
(/root/reference/Makefile:26,38-39 is a static report); these rules are the
TPU-side measurement contract everything in BASELINE.md rests on.
"""

from agilex_ntt_tpu.utils.profiling import _trace_per_call_seconds

US = 1.0  # trace timestamps/durations are microseconds


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name", "args": {"name": name}}


def _ev(pid, name, ts, dur, tid=0):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name, "ts": ts, "dur": dur}


def _trace(events):
    return {"traceEvents": [_meta(7, "/device:TPU:0"), _meta(1, "host threads")] + events}


def test_nested_module_and_op_counted_once():
    # 8 calls; each call emits the module event AND a same-span nested op
    # event on a different tid of the device pid (the real round-3 trace
    # shape: jit_fwd_ntt 10x 22.473ms + fwd_ntt.1 10x 22.473ms).
    evs = []
    for i in range(8):
        t0 = 1000.0 * i
        evs.append(_ev(7, "jit_fwd_ntt(...)", t0, 100 * US, tid=1))
        evs.append(_ev(7, "fwd_ntt.1", t0, 100 * US, tid=2))
    sec = _trace_per_call_seconds(_trace(evs))
    assert abs(sec - 100e-6) < 1e-12  # NOT 200e-6


def test_strictly_nested_op_dropped():
    # Op event strictly inside the module span (ts later, end earlier).
    evs = []
    for i in range(4):
        t0 = 1000.0 * i
        evs.append(_ev(7, "jit_fwd_ntt(...)", t0, 100 * US, tid=1))
        evs.append(_ev(7, "fusion.42", t0 + 5, 90 * US, tid=2))
    assert abs(_trace_per_call_seconds(_trace(evs)) - 100e-6) < 1e-12


def test_multi_executable_path_sums_both():
    # Two-kernel path (e.g. four-step + HBM relayout copy): two disjoint
    # top-level executables per call must BOTH count — dominant-name-only
    # (the round-2 form) would drop the copy.
    evs = []
    for i in range(4):
        t0 = 1000.0 * i
        evs.append(_ev(7, "jit_columns(...)", t0, 70 * US, tid=1))
        evs.append(_ev(7, "jit_rows(...)", t0 + 80, 30 * US, tid=1))
    assert abs(_trace_per_call_seconds(_trace(evs)) - 100e-6) < 1e-12


def test_flush_loss_normalizes_per_name():
    # Trailing executions can miss the stop_trace flush with different
    # counts per executable: A captured 8x, B captured 3x.  Each name
    # normalizes by its own captured count.
    evs = []
    for i in range(8):
        evs.append(_ev(7, "jit_a(...)", 1000.0 * i, 60 * US, tid=1))
    for i in range(3):
        evs.append(_ev(7, "jit_b(...)", 1000.0 * i + 100, 40 * US, tid=1))
    assert abs(_trace_per_call_seconds(_trace(evs)) - 100e-6) < 1e-12


def test_once_only_readback_excluded():
    # The scalar-readback reduce runs once per chained run, not per call.
    evs = [_ev(7, "jit_a(...)", 1000.0 * i, 50 * US, tid=1) for i in range(6)]
    evs.append(_ev(7, "reduce.99", 9000.0, 500 * US, tid=1))
    assert abs(_trace_per_call_seconds(_trace(evs)) - 50e-6) < 1e-12


def test_host_pid_ignored():
    evs = [_ev(7, "jit_a(...)", 1000.0 * i, 50 * US, tid=1) for i in range(4)]
    evs += [_ev(1, "dispatch", 1000.0 * i, 900 * US) for i in range(4)]
    assert abs(_trace_per_call_seconds(_trace(evs)) - 50e-6) < 1e-12


def test_no_device_pid_returns_none():
    tr = {"traceEvents": [_meta(1, "host threads"), _ev(1, "x", 0, 10)]}
    assert _trace_per_call_seconds(tr) is None


def test_nothing_repeated_falls_back_to_dominant():
    evs = [
        _ev(7, "jit_a(...)", 0.0, 80 * US, tid=1),
        _ev(7, "jit_b(...)", 100.0, 20 * US, tid=1),
    ]
    assert abs(_trace_per_call_seconds(_trace(evs)) - 80e-6) < 1e-12


def test_multi_dispatch_per_call_counts_multiplicity():
    # A Python loop dispatching the same jitted executable 16x per call
    # (the composed linear-transform bench): per-name normalization alone
    # collapses the 16 executions to one (round-4 bug — the composed form
    # measured 16x fast).  With iters passed, the chain-level accounting
    # recovers the multiplicity: 4 calls x (16 x 10us + 1 x 20us) = 180us.
    evs = []
    for c in range(4):
        t0 = 10000.0 * c
        for j in range(16):
            evs.append(_ev(7, "jit_keyswitch(...)", t0 + 100 * j, 10 * US, tid=1))
        evs.append(_ev(7, "jit_auto(...)", t0 + 1700, 20 * US, tid=1))
    assert abs(_trace_per_call_seconds(_trace(evs), iters=4) - 180e-6) < 1e-12
    # without iters the parser keeps the legacy per-name lower bound
    assert abs(_trace_per_call_seconds(_trace(evs)) - 30e-6) < 1e-12


def test_multiplicity_accounting_excludes_readback_and_flush_loss():
    # chain-level accounting must still exclude once-only (per-chain)
    # events, and per-name normalization must still win under flush loss.
    evs = [_ev(7, "jit_a(...)", 1000.0 * i, 50 * US, tid=1) for i in range(8)]
    evs.append(_ev(7, "reduce.99", 9000.0, 500 * US, tid=1))
    # full capture, single dispatch: both accountings agree at 50us
    assert abs(_trace_per_call_seconds(_trace(evs), iters=8) - 50e-6) < 1e-12
    # flush loss: only 4 of 8 captured -> per-chain says 25us, per-name 50us
    lossy = evs[:4]
    assert abs(_trace_per_call_seconds(_trace(lossy), iters=8) - 50e-6) < 1e-12
