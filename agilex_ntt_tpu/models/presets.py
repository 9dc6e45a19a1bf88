"""Preset rings for the transform sizes the reference supports.

The reference hard-codes its size menu as a compile-time lookup table
(``FPGA_NTT_SIZE`` in {32, 1024, 8192, 16384, 32768},
``/root/reference/include/kernel/ntt.h:11-23`` duplicated at
``src/kernel/ntt.cpp:70-80``) and ships with a dummy modulus (65537,
``src/main.cpp:53``).  Here each size becomes a named preset with real
SEAL-Embedded-style 30-bit prime chains, constructed on demand.

SEAL-Embedded targets small-device FHE parameter sets; the deeper RNS chains
(3 primes at n=4096 and up) match its typical modulus budgets.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from ..api import Ring, RNSRing


@dataclasses.dataclass(frozen=True)
class Preset:
    name: str
    n: int
    num_primes: int
    note: str


PRESETS: Dict[str, Preset] = {
    p.name: p
    for p in [
        Preset("tiny", 32, 1, "reference's smallest config (ntt.h:12)"),
        Preset("n1024", 1024, 1, "SEAL-Embedded n=1024 single prime"),
        Preset("n4096", 4096, 3, "SEAL-Embedded n=4096, 3-prime RNS chain"),
        Preset("n8192", 8192, 3, "reference size menu entry (ntt.h:16)"),
        Preset("n16384", 16384, 4, "reference default FPGA_NTT_SIZE (main.cpp:9)"),
        Preset("n32768", 32768, 4, "reference's largest config (ntt.h:22)"),
    ]
}


def preset_ring(name: str, **ring_kwargs) -> Ring:
    """Single-prime ring for a named preset (first prime of its chain)."""
    p = PRESETS[name]
    return Ring(p.n, **ring_kwargs)


def preset_rns(name: str, **ring_kwargs) -> RNSRing:
    """Full RNS ring (all primes of the preset's chain)."""
    p = PRESETS[name]
    return RNSRing(p.n, num_primes=p.num_primes, **ring_kwargs)
