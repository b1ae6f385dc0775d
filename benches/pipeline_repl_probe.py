"""Pipelined REPL sustained latency (VERDICT r4 #6).

The live console's single-expression wall through the axon tunnel is
transport-bound: 18.3 ms of device bootstrap + ~44 ms of relay RTTs
(BENCH.md round-4) = 62-72 ms, vs the reference's zero-transport 30.6 ms
console answer (``nander/src/main.rs:56-63``).  The pipelined mode
(``FusedEvaluator.eval_bits``; console ';'-lines) amortizes the transport:
K expressions lower into ONE shared wire file, run depth(combined DAG)
level dispatches, and decrypt ALL K roots in one readback.

This probe measures the SUSTAINED ms/expression on the real device for
K = 1 / 4 / 8 single-gate expressions per session (the interactive worst
case: every session pays the full per-session transport), with the
latency-mode panel key (the single-launch rotation kernel) and a nonce
wire varied per session so the relay's identical-execution cache cannot
short-circuit.  Each session ends in a real readback (the bits), so wall
times are honest end-to-end interactive numbers, not slope artifacts.

Usage: RUSTFHE_ENGINE=pallas_k2 python benches/pipeline_repl_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from rustfhe_tpu import keys
from rustfhe_tpu.apps import nander
from rustfhe_tpu.apps.replprog import FusedEvaluator
from rustfhe_tpu.context import TFHE
from rustfhe_tpu.engine import select_fast_engine
from rustfhe_tpu.params import DEFAULT_PARAMS as P

ITERS = int(os.environ.get("PROBE_ITERS", "10"))

# K single-gate expressions per session; results asserted every call.
EXPRS = ["1 $ 0", "1 & 1", "0 | 0", "1 ^ 0", "0 $ 0", "1 & 0", "1 | 0",
         "1 ^ 1"]
WANT = [1, 1, 0, 1, 1, 0, 1, 0]


def main():
    from rustfhe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"# device: {jax.devices()[0].platform} "
          f"{getattr(jax.devices()[0], 'device_kind', '?')}", flush=True)
    eng = select_fast_engine(P)
    print(f"# engine: {eng}", flush=True)
    sk, ck = keys.gen_keys(jax.random.PRNGKey(0), P, engine_name=eng)
    t0 = time.perf_counter()
    ckp = keys.cloud_key_panels(ck, P, eng)
    jax.block_until_ready(jax.tree.leaves(ckp))
    print(f"# latency (panel) key ready in {time.perf_counter() - t0:.1f}s",
          flush=True)
    ctx = TFHE(sk, ckp, P, eng)
    ev = FusedEvaluator(ctx)

    for K in (1, 4, 8):
        asts = [nander.parse_logic_expr(e) for e in EXPRS[:K]]
        want = WANT[:K]
        nonce = lambda: np.random.randint(0, 2**31, P.n)
        assert ev.eval_bits(asts, _nonce=nonce()) == want  # compile + check
        t0 = time.perf_counter()
        for _ in range(ITERS):
            assert ev.eval_bits(asts, _nonce=nonce()) == want
        dt = (time.perf_counter() - t0) / ITERS
        print(f"pipelined session K={K}: {dt * 1e3:.1f} ms wall -> "
              f"{dt / K * 1e3:.1f} ms/expression sustained "
              f"({'BEATS' if dt / K * 1e3 < 30.6 else 'vs'} the reference's "
              f"30.6 ms console answer)", flush=True)


if __name__ == "__main__":
    main()
