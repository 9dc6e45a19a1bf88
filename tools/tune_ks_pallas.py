#!/usr/bin/env python
"""Keyswitch scheme-op autotune, Pallas candidates only.

The XLA-backend keyswitch candidate's graph compile reliably wedges
through the remote tunnel (4 supervised tries, CPU frozen each time —
see CLAUDE.md's hang pattern); this tool times the three Pallas
candidates and records the XLA one as compile-prohibitive, producing the
same JSON row shape as `python -m agilex_ntt_tpu.utils.autotune`.
"""

import json
import sys

sys.path.insert(0, ".")

from agilex_ntt_tpu.utils import autotune  # noqa: E402

autotune._scheme_candidates = lambda n, on_tpu: [
    {"method": "radix2", "backend": "pallas", "block_rows": None},
    {"method": "radix2", "backend": "pallas", "block_rows": 64},
    {"method": "radix2", "backend": "pallas", "block_rows": 128},
]
r = autotune.tune_scheme("keyswitch", 4096, 512, L=3, dnum=3, refresh=True)
r["candidates"].append({
    "config": {"method": "radix2", "backend": "xla"},
    "seconds": None,
    "error": "not timed: XLA keyswitch graph compile wedges through the "
             "remote tunnel (CLAUDE.md hang pattern)",
})
print(json.dumps({"device": autotune.device_key(), "op": "keyswitch",
                  "n": 4096, "batch": 512, "L": 3, "dnum": 3, **r}),
      flush=True)
