"""agilex_ntt_tpu — a TPU-native negacyclic NTT/INTT framework.

Built from scratch in JAX/Pallas with the capabilities of joekurina/Agilex-NTT
(an Intel DPC++/SYCL FPGA forward-NTT derived from HEXL-FPGA); see SURVEY.md
at the repository root for the component-by-component mapping.
"""

from .api import CyclicRing, Ring, RNSRing
from .config import NTTConfig, REFERENCE_SIZES
from .params import NTTParams, find_primes, find_psi, make_params

__version__ = "0.1.0"

__all__ = [
    "Ring",
    "RNSRing",
    "CyclicRing",
    "NTTConfig",
    "NTTParams",
    "REFERENCE_SIZES",
    "find_primes",
    "find_psi",
    "make_params",
]
