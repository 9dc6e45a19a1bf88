"""TPU compute ops: modular arithmetic primitives and Pallas NTT kernels."""

from . import modmul  # noqa: F401
