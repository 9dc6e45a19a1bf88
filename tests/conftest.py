"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices — the TPU analog of the
reference's FPGA emulator flow (``-DFPGA_EMULATOR``, Makefile:24 /
main.cpp:16-20): the same code paths, device-free.  Pallas kernels run in
interpret mode on CPU; multi-chip sharding tests run on the virtual mesh.

jax.config.update is used (not env vars) because this environment's
sitecustomize imports jax at interpreter startup, before pytest loads
conftest; the config route still works as long as no backend has been
initialized.

Set NTT_TPU_REAL_DEVICE=1 to run the suite on real hardware instead.
"""

import os

if not os.environ.get("NTT_TPU_REAL_DEVICE"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

from agilex_ntt_tpu.params import make_params, find_primes


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


def params_for(n: int, idx: int = 0):
    q = find_primes(n, idx + 1)[idx]
    return make_params(n, q)


def require_devices(k: int) -> None:
    """Skip the calling test unless k devices exist.  Mesh tests need the
    8-virtual-device CPU harness; on the real 1-chip TPU
    (NTT_TPU_REAL_DEVICE=1) they must skip, not fail (caught by the
    round-5 on-chip run: round-3/4 sharded tests raised instead)."""
    import jax

    if len(jax.devices()) < k:
        pytest.skip(f"needs {k} (virtual) devices")
