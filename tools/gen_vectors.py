#!/usr/bin/env python
"""Generate the SEAL-Embedded-style NTT known-answer-test battery.

The reference claims to "perform the NTT Tests taken from SEAL Embedded"
(/root/reference/README.md:13) but ships no vectors, no NTL harness, and an
empty test header (SURVEY.md §4).  This script actually produces that
battery: for each transform size, a seeded random polynomial, its forward
negacyclic NTT, and a polymul triple — computed by the native C core
(csrc/nttcore.c) and certified at generation time against the fully
independent big-int oracle (golden.naive_negacyclic_ntt, O(n^2) evaluation at
psi^(2*bitrev(k)+1)).

Output: tests/vectors/ntt_kat.npz  (regenerate with `python tools/gen_vectors.py`).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agilex_ntt_tpu import golden as G
from agilex_ntt_tpu import native
from agilex_ntt_tpu.params import find_primes, make_params

# full reference size menu (include/kernel/ntt.h:11-23) plus n=4096
SIZES = [32, 1024, 4096, 8192, 16384, 32768]
ORACLE_FULL = {32, 1024}   # big-int oracle over every output index
ORACLE_SPOT = 64           # spot indices for larger sizes

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "vectors", "ntt_kat.npz")


def main():
    assert native.available(), "build the native core first: make native"
    rng = np.random.default_rng(0xCAFE)
    blobs = {}
    for n in SIZES:
        q = find_primes(n, 1)[0]
        pp = make_params(n, q)
        x = rng.integers(0, q, size=n, dtype=np.uint64)
        y = native.fwd_ntt(x[None, :], q, pp.roots, pp.precon64)[0]

        # certify against the independent big-int oracle
        if n in ORACLE_FULL:
            oracle = G.naive_negacyclic_ntt([int(v) for v in x], pp)
            assert [int(v) for v in y] == oracle, f"oracle mismatch at n={n}"
        else:
            from agilex_ntt_tpu.params import bit_reverse
            idxs = rng.choice(n, size=ORACLE_SPOT, replace=False)
            for k in idxs:
                e = 2 * bit_reverse(int(k), pp.log_n) + 1
                root = pow(pp.psi, e, q)
                acc, p = 0, 1
                for c in x:
                    acc = (acc + int(c) * p) % q
                    p = p * root % q
                assert acc == int(y[k]), f"spot oracle mismatch n={n} k={k}"

        # roundtrip certification
        back = native.inv_ntt(y[None, :], q, pp.inv_roots, pp.inv_precon64)[0]
        assert (back == x).all(), f"roundtrip failed at n={n}"

        # polymul triple (negacyclic convolution), certified for n=32
        a = rng.integers(0, q, size=n, dtype=np.uint64)
        b = rng.integers(0, q, size=n, dtype=np.uint64)
        fa = native.fwd_ntt(a[None, :], q, pp.roots, pp.precon64)
        fb = native.fwd_ntt(b[None, :], q, pp.roots, pp.precon64)
        fc = native.pointwise(fa, fb, q)
        c = native.inv_ntt(fc, q, pp.inv_roots, pp.inv_precon64)[0]
        if n == 32:
            want = G.negacyclic_convolution(a, b, q)
            assert [int(v) for v in c] == want

        blobs[f"n{n}_q"] = np.uint64(q)
        blobs[f"n{n}_psi"] = np.uint64(pp.psi)
        blobs[f"n{n}_input"] = x
        blobs[f"n{n}_ntt"] = y
        blobs[f"n{n}_pm_a"] = a
        blobs[f"n{n}_pm_b"] = b
        blobs[f"n{n}_pm_c"] = c
        print(f"n={n}: q={q} certified")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **blobs)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
