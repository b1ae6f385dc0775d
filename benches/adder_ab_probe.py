"""Device A/B of the integer adder cells (VERDICT r3 item 6 measurement).

Interleaved same-session runs of the 8-bit FheUint add at B=32 through
the shared fixed-width-16 bootstrap program, ripple vs Kogge-Stone,
readback-forced timing.  Measured 2026-08-21 (TPU v5e, pallas_k2):
ripple 3.25/3.24 s per add (15 levels) vs Kogge-Stone 1.57/1.53 s
(7 levels) — 2.1x, matching the depth ratio; 32/32 correct every run.

Usage: RUSTFHE_ENGINE=pallas_k2 python benches/adder_ab_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from rustfhe_tpu.context import TFHE
from rustfhe_tpu.params import DEFAULT_PARAMS as P


def main():
    ctx = TFHE.new(jax.random.PRNGKey(2), P,
                   os.environ.get("RUSTFHE_ENGINE", "pallas_k2"))
    ctx.circuit_fixed_width = 16  # ONE compiled program serves both cells
    print("# keys ready", flush=True)
    rng = np.random.default_rng(3)
    B = 32
    av = rng.integers(0, 256, size=B).astype(np.uint64)
    bv = rng.integers(0, 256, size=B).astype(np.uint64)
    for kind in ("kogge_stone", "ripple", "kogge_stone", "ripple"):
        ctx.circuit_adder = kind
        a = ctx.encrypt_uint(av, 8)
        b = ctx.encrypt_uint(bv, 8)
        s = a + b
        _ = s.decrypt()  # warm + settle (readback-forced)
        t0 = time.perf_counter()
        s2 = s + b
        got = s2.decrypt()
        dt = time.perf_counter() - t0
        ok = int((got == ((av + 2 * bv) & 0xFF)).sum())
        assert ok == B, (kind, ok)
        print(f"adder8 [{kind}]: {ok}/{B} correct, {dt * 1e3:.0f} ms per add",
              flush=True)


if __name__ == "__main__":
    main()
