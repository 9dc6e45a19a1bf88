"""Measured kernel-config selection with a persisted per-device cache.

``Ring`` ships static dispatch defaults (``MAX_RADIX2_N``, the n < 128 XLA
fallback, the tiled four-step layout) that encode v5e measurements from
BASELINE.md.  Those are the right defaults for the measured chip, but they
are *asserted* for any other device generation — and some choices are
genuinely shape-dependent (flat vs tiled four-step kernels trade a relayout
against wider stage tables; the best ``block_rows`` depends on batch).

This module replaces the assertions with measurements: ``tune()`` times
every valid candidate config for an (op, n, batch) workload on the *current*
device and persists the winner in a JSON cache keyed by device kind, so the
timing pass runs once per device generation, not once per process.
``tuned_ring()`` is the one-call form.

Reference analog: the FPGA flow specializes per (FPGA_NTT_SIZE, modulus) at
synthesis time (``/root/reference/include/kernel/ntt.h:11-23``, one
bitstream per config); here specialization is a runtime timing pass whose
result persists per device kind — the JIT-era equivalent of keeping the
best bitstream per board.

Typical use::

    from agilex_ntt_tpu.utils import autotune
    ring = autotune.tuned_ring(65536, batch=512, op="ntt")
    # first call on a new device kind: times ~4 candidates, caches winner
    # every later call: cache hit, no timing

CLI (one line of JSON per workload, used by the hw measurement queue)::

    python -m agilex_ntt_tpu.utils.autotune 65536 512 --op ntt
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..api import MAX_RADIX2_N, Ring
from ..ops.flat_fuse import FLAT_FUSE_MAX_N
from ..ops.ntt_kernel import MIN_KERNEL_N
from .profiling import device_time

#: Ring kwargs that a candidate/cached config may carry.  Anything else in
#: a cache entry is ignored (forward compatibility across versions).
_CONFIG_KEYS = ("method", "backend", "block_rows", "fourstep_kernel")

_OPS = ("ntt", "intt", "polymul")


def default_cache_path() -> str:
    env = os.environ.get("NTT_TPU_AUTOTUNE_CACHE")
    if env:
        return env
    return os.path.join(
        os.path.expanduser("~"), ".cache", "agilex_ntt_tpu", "autotune.json"
    )


def device_key() -> str:
    """Cache namespace: the accelerator generation (configs tuned on one
    v5e chip transfer to every v5e chip, not to a v4 or a CPU)."""
    try:
        d = jax.devices()[0]
    except RuntimeError:
        return "cpu"
    return getattr(d, "device_kind", d.platform) or d.platform


def candidate_configs(n: int, *, on_tpu: Optional[bool] = None) -> List[Dict]:
    """Every valid Ring config for size n, cheapest-to-compile first.

    The space mirrors api.py's constraints: radix-2 exists for
    n <= MAX_RADIX2_N (Pallas form needs n >= MIN_KERNEL_N), four-step for
    any composite split (worth timing once n reaches 2^14, where both
    factors hit the 128-lane kernel floor), and the flat four-step layout
    for n <= FLAT_FUSE_MAX_N.  On non-TPU platforms Pallas runs only in
    interpret mode (not a performance path), so candidates collapse to XLA.
    """
    if on_tpu is None:
        on_tpu = device_key() not in ("cpu", "gpu")
    out: List[Dict] = []
    if n <= MAX_RADIX2_N:
        out.append({"method": "radix2", "backend": "xla"})
        if on_tpu and n >= MIN_KERNEL_N:
            out.append({"method": "radix2", "backend": "pallas"})
    if n >= (1 << 14) and on_tpu:
        out.append({"method": "fourstep", "backend": "pallas",
                    "fourstep_kernel": "tiled"})
        if n <= FLAT_FUSE_MAX_N:
            out.append({"method": "fourstep", "backend": "pallas",
                        "fourstep_kernel": "flat"})
    if n >= (1 << 14) and not on_tpu:
        out.append({"method": "fourstep", "backend": "xla"})
    return out


def _op_timer(ring: Ring, op: str) -> Callable:
    """y = f(y) self-chaining form for the delta-method timer (each call's
    input depends on the previous output, so calls cannot overlap)."""
    if op == "ntt":
        return lambda v: ring.ntt(v)
    if op == "intt":
        return lambda v: ring.intt(v)
    if op == "polymul":
        return lambda v: ring.polymul(v, v)
    raise ValueError(f"unknown op {op!r}; expected one of {_OPS}")


def _load_cache(path: str) -> Dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store_cache(path: str, cache: Dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # atomic replace: concurrent tuners must not interleave partial JSON
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _cache_key(op: str, n: int, batch: int, q: int) -> str:
    return f"{op}|n={n}|b={batch}|qbits={q.bit_length()}"


def cached_config(
    n: int,
    q: int,
    op: str = "ntt",
    *,
    cache_path: Optional[str] = None,
) -> Optional[Dict]:
    """Best persisted config for (op, n, q-bits) on this device kind, or
    None on a miss.  ``Ring(..., method="auto")`` consults this at
    construction (no timing, no device work beyond reading the device
    kind); batch is not known at Ring construction, so among cached
    batches the LARGEST wins — the throughput regime every BASELINE.md
    config was tuned in.  Entries are written by ``tune()`` / the CLI.
    """
    dev = device_key()
    entries = _load_cache(cache_path or default_cache_path()).get(dev, {})
    prefix = f"{op}|n={n}|b="
    suffix = f"|qbits={q.bit_length()}"
    best_batch, hit = -1, None
    for key, val in entries.items():
        if not (key.startswith(prefix) and key.endswith(suffix)):
            continue
        try:
            batch = int(key[len(prefix):-len(suffix)])
        except ValueError:
            continue
        if batch > best_batch:
            best_batch, hit = batch, val
    if hit is None:
        return None
    return {k: hit["config"][k] for k in _CONFIG_KEYS if k in hit["config"]}


def tune(
    n: int,
    batch: int,
    op: str = "ntt",
    *,
    q: Optional[int] = None,
    iters: int = 8,
    timer: Optional[Callable] = None,
    cache_path: Optional[str] = None,
    use_cache: bool = True,
    refresh: bool = False,
) -> Dict:
    """Pick the fastest Ring config for (op, n, batch) on this device.

    Times every ``candidate_configs(n)`` entry with the delta-method device
    timer (min-of-trials; see utils/profiling.py for why the naive form
    overstates throughput through the tunnel) and returns::

        {"config": {...Ring kwargs...}, "seconds": t, "tuned": bool,
         "candidates": [{"config": ..., "seconds": ...}, ...]}

    The winner is persisted under (device kind, op, n, batch, q-bits); a
    cache hit skips timing entirely (``tuned=False``, empty candidates).
    A candidate that fails to build or run (e.g. a compile-time bound on a
    new device) is recorded with ``seconds=None`` and skipped — tuning
    degrades to the surviving space instead of raising.

    ``timer(fn, x, iters)`` is injectable for tests; the default is
    ``profiling.device_time``.
    """
    if op not in _OPS:
        raise ValueError(f"unknown op {op!r}; expected one of {_OPS}")
    ring0 = Ring(n, q)  # resolves the default prime once for the cache key
    qv = ring0.q
    path = cache_path or default_cache_path()
    dev = device_key()
    key = _cache_key(op, n, batch, qv)
    if use_cache and not refresh:
        hit = _load_cache(path).get(dev, {}).get(key)
        if hit is not None:
            cfg = {k: hit["config"][k] for k in _CONFIG_KEYS
                   if k in hit["config"]}
            return {"config": cfg, "seconds": hit.get("seconds"),
                    "tuned": False, "candidates": []}

    time_fn = timer or (
        lambda fn, x, it: min(device_time(fn, x, iters=it) for _ in range(3))
    )
    rng_x = jax.random.randint(
        jax.random.PRNGKey(0), (batch, n), 0, qv, dtype=jnp.uint32
    )
    results = []
    for cfg in candidate_configs(n):
        try:
            ring = Ring(n, qv, **cfg)
            t = float(time_fn(_op_timer(ring, op), rng_x, iters))
        except Exception as e:  # candidate invalid on this device: skip
            results.append({"config": cfg, "seconds": None, "error": str(e)})
            continue
        results.append({"config": cfg, "seconds": t})
    alive = [r for r in results if r["seconds"] is not None]
    if not alive:
        raise RuntimeError(
            f"no candidate config survived for op={op} n={n} batch={batch}: "
            + "; ".join(str(r.get("error")) for r in results)
        )
    best = min(alive, key=lambda r: r["seconds"])
    if use_cache:
        cache = _load_cache(path)
        cache.setdefault(dev, {})[key] = {
            "config": best["config"], "seconds": best["seconds"],
        }
        _store_cache(path, cache)
    return {"config": dict(best["config"]), "seconds": best["seconds"],
            "tuned": True, "candidates": results}


#: scheme-level fused ops the tuner can time (VERDICT round-4 item 8):
#: the evaluator inner loops whose dispatch configuration (backend,
#: block_rows) was previously inherited from the single-op sweeps.
_SCHEME_OPS = ("tensor", "keyswitch")


def _scheme_candidates(n: int, on_tpu: bool) -> List[Dict]:
    """Configs worth timing for the fused scheme ops at radix-2 sizes:
    the Pallas kernels over a block_rows menu, plus the XLA fallback."""
    out: List[Dict] = [{"method": "radix2", "backend": "xla"}]
    if on_tpu and MIN_KERNEL_N <= n <= MAX_RADIX2_N:
        for br in (None, 64, 128, 256):
            out.append({"method": "radix2", "backend": "pallas",
                        "block_rows": br})
    return out


def tune_scheme(
    op: str,
    n: int,
    batch: int,
    *,
    L: int = 3,
    dnum: int = 3,
    iters: int = 8,
    timer: Optional[Callable] = None,
    cache_path: Optional[str] = None,
    use_cache: bool = True,
    refresh: bool = False,
    on_tpu: Optional[bool] = None,
) -> Dict:
    """Measure the best RNSRing config for a fused scheme op at L>1.

    ``op``: "tensor" (the RLWE ciphertext tensor product, ONE dispatch over
    L channels) or "keyswitch" (hybrid key switch: gadget decomposition ->
    extended polydot -> ModDown, dnum digits over L+dnum/... primes).
    Shapes follow the serving configuration in tools/bench_suite.py.
    Winners persist under a key carrying (op, n, batch, L, dnum), separate
    from the single-op entries ``Ring(method="auto")`` consults.
    """
    import numpy as np

    from ..api import RNSRing
    from ..params import find_primes

    if op not in _SCHEME_OPS:
        raise ValueError(f"unknown scheme op {op!r}; expected {_SCHEME_OPS}")
    if on_tpu is None:
        on_tpu = device_key() not in ("cpu", "gpu")
    qs_all = find_primes(n, L + 1)
    path = cache_path or default_cache_path()
    dev = device_key()
    key = f"{op}|n={n}|b={batch}|L={L}|dnum={dnum}"
    if use_cache and not refresh:
        hit = _load_cache(path).get(dev, {}).get(key)
        if hit is not None:
            cfg = {k: hit["config"][k] for k in _CONFIG_KEYS
                   if k in hit["config"]}
            return {"config": cfg, "seconds": hit.get("seconds"),
                    "tuned": False, "candidates": []}

    time_fn = timer or (
        lambda fn, x, it: min(device_time(fn, x, iters=it) for _ in range(3))
    )
    rng = np.random.default_rng(0)
    results = []
    for cfg in _scheme_candidates(n, on_tpu):
        try:
            rq = RNSRing(n, qs=qs_all[:L], **cfg)
            if op == "tensor":
                x = jnp.asarray(rng.integers(
                    0, min(rq.qs), size=(L, batch, n), dtype=np.uint32
                ))
                fn = lambda v: rq.tensor(v, x, x, x)[0].astype(jnp.uint32)
            else:  # keyswitch
                rqp = RNSRing(n, qs=qs_all, **cfg)
                ksk = jnp.asarray(np.stack(
                    [np.stack([rng.integers(0, q, size=n, dtype=np.uint32)
                               for q in qs_all]) for _ in range(dnum)]
                ))
                x = jnp.asarray(rng.integers(
                    0, min(rq.qs), size=(L, batch, n), dtype=np.uint32
                ))
                fn = lambda v: rq.keyswitch(v, ksk, rqp, dnum)
            t = float(time_fn(fn, x, iters))
        except Exception as e:  # candidate invalid on this device: skip
            results.append({"config": cfg, "seconds": None, "error": str(e)})
            continue
        results.append({"config": cfg, "seconds": t})
    alive = [r for r in results if r["seconds"] is not None]
    if not alive:
        raise RuntimeError(
            f"no candidate config survived for scheme op={op} n={n} "
            f"batch={batch}: "
            + "; ".join(str(r.get("error")) for r in results)
        )
    best = min(alive, key=lambda r: r["seconds"])
    if use_cache:
        cache = _load_cache(path)
        cache.setdefault(dev, {})[key] = {
            "config": best["config"], "seconds": best["seconds"],
        }
        _store_cache(path, cache)
    return {"config": dict(best["config"]), "seconds": best["seconds"],
            "tuned": True, "candidates": results}


def tuned_ring(
    n: int,
    batch: int,
    op: str = "ntt",
    *,
    q: Optional[int] = None,
    cache_path: Optional[str] = None,
    **tune_kwargs,
) -> Ring:
    """A Ring built from the measured-best config for (op, n, batch)."""
    picked = tune(n, batch, op, q=q, cache_path=cache_path, **tune_kwargs)
    return Ring(n, q, **picked["config"])


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="time candidate kernel configs, print + cache winners"
    )
    ap.add_argument("n", type=int)
    ap.add_argument("batch", type=int)
    ap.add_argument("--op", default="all",
                    choices=("all", "scheme") + _OPS + _SCHEME_OPS)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--L", type=int, default=3, help="primes (scheme ops)")
    ap.add_argument("--dnum", type=int, default=3,
                    help="key-switch digits (scheme ops)")
    ap.add_argument("--refresh", action="store_true",
                    help="re-time even on a cache hit")
    args = ap.parse_args(argv)
    if args.op == "all":
        ops = _OPS
    elif args.op == "scheme":
        ops = _SCHEME_OPS
    else:
        ops = (args.op,)
    for op in ops:
        if op in _SCHEME_OPS:
            r = tune_scheme(op, args.n, args.batch, L=args.L,
                            dnum=args.dnum, iters=args.iters,
                            refresh=args.refresh)
            extra = {"L": args.L, "dnum": args.dnum}
        else:
            r = tune(args.n, args.batch, op, iters=args.iters,
                     refresh=args.refresh)
            extra = {}
        print(json.dumps({
            "device": device_key(), "op": op, "n": args.n,
            "batch": args.batch, **extra, **r,
        }), flush=True)


if __name__ == "__main__":
    main()
