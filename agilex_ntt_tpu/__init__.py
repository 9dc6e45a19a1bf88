"""agilex_ntt_tpu — a TPU-native negacyclic NTT/INTT framework.

Built from scratch in JAX/Pallas with the capabilities of joekurina/Agilex-NTT
(an Intel DPC++/SYCL FPGA forward-NTT derived from HEXL-FPGA); see SURVEY.md
at the repository root for the component-by-component mapping.
"""

import os as _os

if _os.environ.get("NTT_TPU_COMPILE_CACHE"):
    # opt-in persistent XLA compilation cache: first TPU compiles in this
    # environment take 20-60 s; cached recompiles are near-instant.
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir", _os.environ["NTT_TPU_COMPILE_CACHE"]
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .api import CyclicRing, Ring, RNSRing, WideRing
from .config import NTTConfig, REFERENCE_SIZES
from .params import NTTParams, find_primes, find_psi, make_params

__version__ = "0.1.0"

__all__ = [
    "Ring",
    "RNSRing",
    "CyclicRing",
    "WideRing",
    "NTTConfig",
    "NTTParams",
    "REFERENCE_SIZES",
    "find_primes",
    "find_psi",
    "make_params",
]
