"""One-shot composed-forward parity at the LIVE scale (t=h=w=128).

VERDICT r4 #6a: the fast/slow tiers cover t32/t64; the production config
is t128 (`/root/reference/train.py:77-86`) where the LCT FFT sizes differ
and five stages of 5e-3 tolerances could compound.  This script runs the
exact test harness (`tests/test_torch_import.py::_full_forward_parity`)
once at 128 on CPU and records the max relative errors; paste the output
into BENCH_NOTES.md.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/parity_t128.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import test_torch_import as T  # noqa: E402

t0 = time.time()
errs = T._full_forward_parity(128)
print(json.dumps({"size": 128, "seconds": round(time.time() - t0, 1), **errs}))
