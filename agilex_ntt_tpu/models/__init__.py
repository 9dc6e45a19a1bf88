"""Ring presets — the runtime analog of the reference's compile-time size menu."""

from .presets import PRESETS, preset_ring, preset_rns
