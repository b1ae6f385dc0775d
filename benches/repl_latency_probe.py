"""Single-gate / REPL latency probe (VERDICT r3 item 1).

Target: the reference evaluates one HomNAND in 30.6 ms on its CPU
(``hom_nand/src/tfhe.rs:297``); round 3's best interactive number here was
68 ms.  This probe measures, on the real device, every lever of the B=1
path and the composed fused-REPL latency:

  1. bootstrap-only latency at B=1 for each key mode:
     standard / latency (prebuilt panels) / hybrid / hybrid+full-panels
     (pair steps, zero in-step builds) — CHAINED (out feeds the next
     pre-combination) so the relay's identical-execution cache cannot
     short-circuit the timing;
  2. the fused REPL path (apps/replprog.py: ONE dispatch for a single
     NAND, leaves + precombine + rotation + lv1 decrypt in-program),
     with a nonce wire varied per call to defeat the execution cache;
  3. the dispatch floor: an empty-ish jitted program round trip.

Usage:  RUSTFHE_ENGINE=pallas_k2 python benches/repl_latency_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rustfhe_tpu import gates, keys, tlwe
from rustfhe_tpu.apps import nander
from rustfhe_tpu.apps.replprog import FusedEvaluator
from rustfhe_tpu.context import TFHE
from rustfhe_tpu.engine import select_fast_engine
from rustfhe_tpu.params import DEFAULT_PARAMS as P

U32 = jnp.uint32
ITERS = int(os.environ.get("PROBE_ITERS", "10"))


def bench_chained(tag, fn, x0, iters=ITERS):
    x = fn(x0)
    jax.block_until_ready(x)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt * 1e3:.1f} ms", flush=True)
    return dt


def main():
    print(f"# device: {jax.devices()[0].platform} "
          f"{getattr(jax.devices()[0], 'device_kind', '?')}", flush=True)
    eng = select_fast_engine(P)
    print(f"# engine: {eng}", flush=True)
    key = jax.random.PRNGKey(0)
    kg, ke = jax.random.split(key)
    sk, ck = keys.gen_keys(kg, P, engine_name=eng)
    print("# keys ready", flush=True)

    c1 = tlwe.encrypt_binary(jax.random.fold_in(ke, 0), sk.lv0,
                             jnp.array([1], U32), P)

    # 0. dispatch floor: trivial jitted round trip on a small array.
    f_id = jax.jit(lambda x: (x + U32(1)).astype(U32))
    bench_chained("dispatch floor (tiny jit)", f_id, c1, iters=20)

    # 1. bootstrap-only at B=1, chained, per key mode.
    modes = {"standard": ck}
    t0 = time.perf_counter()
    modes["latency (panels)"] = keys.cloud_key_panels(ck, P, eng)
    print(f"# panels built in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    modes["hybrid"] = keys.cloud_key_hybrid(ck, P, eng)
    modes["hybrid full-panels"] = keys.cloud_key_hybrid(
        ck, P, eng, full_panels=True)
    print(f"# hybrid keys built in {time.perf_counter() - t0:.1f}s", flush=True)

    for tag, ckm in modes.items():
        def boot(x, _ck=ckm):
            pre = gates.precombine("nand", x, x, params=P)
            return gates.hom_bootstrap(_ck, pre, params=P, engine_name=eng)
        try:
            bench_chained(f"B=1 bootstrap [{tag}]", boot, c1)
        except Exception as e:  # noqa: BLE001 - probe records OOM etc.
            print(f"B=1 bootstrap [{tag}]: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # 2. fused REPL single NAND, per key mode (nonce defeats the cache).
    for tag in ("standard", "latency (panels)", "hybrid full-panels"):
        ctx = TFHE(sk, modes[tag], P, eng)
        ev = FusedEvaluator(ctx)
        ast = nander.parse_logic_expr("1 $ 0")
        plan = ev._plan(ast)
        _, leaf_bits, n_inputs, plans, (iab, coeff) = plan
        assert not plans  # single gate: final program only

        def one(nonce):
            wires_np = np.zeros((ev.max_wires, P.n + 1), np.uint32)
            for i, bit in enumerate(leaf_bits):
                wires_np[i, 0] = 0x20000000 if bit else 0xE0000000
            wires_np[-1, 1:] = nonce  # cache-busting, result-neutral
            bit = ev._final(modes[tag].bk, sk.lv1, jnp.asarray(wires_np),
                            iab, coeff)
            return int(jax.block_until_ready(bit))

        assert one(np.random.randint(0, 2**31, P.n)) == 1  # compile + check
        t0 = time.perf_counter()
        for it in range(ITERS):
            r = one(np.random.randint(0, 2**31, P.n))
            assert r == 1
        dt = (time.perf_counter() - t0) / ITERS
        print(f"fused REPL NAND [{tag}]: {dt * 1e3:.1f} ms", flush=True)

    # 3. fused 3-gate expression (2 dispatches), best key mode.
    ctx = TFHE(sk, modes["hybrid full-panels"], P, eng)
    ev = FusedEvaluator(ctx)
    ast = nander.parse_logic_expr("(1 & 0) ^ !0")
    nonce = lambda: np.random.randint(0, 2**31, P.n)
    assert ev.eval_bit(ast, _nonce=nonce()) == 1
    t0 = time.perf_counter()
    for _ in range(ITERS):
        assert ev.eval_bit(ast, _nonce=nonce()) == 1
    print(f"fused 3-gate expr [hybrid full-panels]: "
          f"{(time.perf_counter() - t0) / ITERS * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
