"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices — the TPU analog of the
reference's FPGA emulator flow (``-DFPGA_EMULATOR``, Makefile:24 /
main.cpp:16-20): the same code paths, device-free.  Pallas kernels run in
interpret mode on CPU; multi-chip sharding tests run on the virtual mesh.

Set NTT_TPU_REAL_DEVICE=1 to run the suite on real hardware instead.
"""

import os

if not os.environ.get("NTT_TPU_REAL_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest

from agilex_ntt_tpu.params import make_params, find_primes


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


def params_for(n: int, idx: int = 0):
    q = find_primes(n, idx + 1)[idx]
    return make_params(n, q)
