"""Single-gate / REPL latency probe (VERDICT r3 item 1).

Target: the reference evaluates one HomNAND in 30.6 ms on its CPU
(``hom_nand/src/tfhe.rs:297``); round 3's best interactive number here was
68 ms.  This probe measures, on the real device, every lever of the B=1
path and the composed fused-REPL latency:

  1. the dispatch floor (a tiny jitted round trip through the relay);
  2. per key mode — standard / latency (prebuilt panels) / hybrid /
     hybrid+full-panels (pair steps, zero in-step builds) — the
     bootstrap-only latency at B=1, CHAINED (out feeds the next
     pre-combination) so the relay's identical-execution cache cannot
     short-circuit, and the fused REPL single-NAND path (ONE dispatch:
     leaves + precombine + rotation + lv1 decrypt in-program, a nonce
     wire varied per call to defeat the execution cache).

  Key modes are built, measured and RELEASED one at a time: the panel
  tables are ~12.6 GiB each at production parameters — two modes cannot
  coexist in a v5e's 16 GB HBM.

  3. the fused 3-gate expression (2 dispatches) on the last mode.

Usage:  RUSTFHE_ENGINE=pallas_k2 python benches/repl_latency_probe.py
"""

import gc
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
    """SLOPE method: K1 vs K2 chained applications, each run ENDING IN A
    REAL READBACK — `block_until_ready` is not a completion barrier for
    every program through the relay (BENCH.md round-4 methodology note);
    the slope removes the transport intercept."""
    x = fn(x0)
    _ = np.asarray(x[..., :4])  # compile + warm + settle
    ks = (max(1, iters // 5), iters)
    times = {}
    for k in ks:
        y = fn(x0)
        _ = np.asarray(y[..., :4])
        t0 = time.perf_counter()
        for _i in range(k):
            y = fn(y)
        _ = np.asarray(y[..., :4])  # force completion through the relay
        times[k] = time.perf_counter() - t0
    k1, k2 = ks
    dt = (times[k2] - times[k1]) / (k2 - k1)
    icept = times[k1] - k1 * dt
    print(f"{tag}: {dt * 1e3:.1f} ms (slope; transport intercept "
          f"{icept * 1e3:.1f} ms)", flush=True)
    return dt


def bench_fused_nand(tag, ckm, sk, eng):
    ctx = TFHE(sk, ckm, P, eng)
    ev = FusedEvaluator(ctx)
    ast = nander.parse_logic_expr("1 $ 0")
    nonce = lambda: np.random.randint(0, 2**31, P.n)
    assert ev.eval_bit(ast, _nonce=nonce()) == 1  # compile + check
    t0 = time.perf_counter()
    for _ in range(ITERS):
        assert ev.eval_bit(ast, _nonce=nonce()) == 1
    dt = (time.perf_counter() - t0) / ITERS
    print(f"fused REPL NAND [{tag}]: {dt * 1e3:.1f} ms", flush=True)
    return ctx


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

    # 1+2. per key mode, built and released one at a time (HBM budget).
    # Even serial release can RESOURCE_EXHAUST on the relay allocator
    # (measured: a second 12.6 GiB panel build fails after the first is
    # dropped), so PROBE_MODES selects a subset per process run:
    #   PROBE_MODES=standard,panels  |  PROBE_MODES=hybrid_full  etc.
    all_builders = {
        "standard": ("standard", lambda: ck),
        "panels": ("latency (panels)",
                   lambda: keys.cloud_key_panels(ck, P, eng)),
        "hybrid": ("hybrid", lambda: keys.cloud_key_hybrid(ck, P, eng)),
        "hybrid_full": ("hybrid full-panels",
                        lambda: keys.cloud_key_hybrid(ck, P, eng,
                                                      full_panels=True)),
    }
    sel = os.environ.get("PROBE_MODES", "standard,panels,hybrid,hybrid_full")
    builders = [all_builders[k] for k in sel.split(",") if k in all_builders]
    last_ctx = None
    for tag, build in builders:
        t0 = time.perf_counter()
        try:
            ckm = build()
            jax.block_until_ready(jax.tree.leaves(ckm))
        except Exception as e:  # noqa: BLE001 — probe records OOM etc.
            print(f"[{tag}] key build FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"# [{tag}] key ready in {time.perf_counter() - t0:.1f}s",
              flush=True)

        def boot(x, _ck=ckm):
            pre = gates.precombine("nand", x, x, params=P)
            return gates.hom_bootstrap(_ck, pre, params=P, engine_name=eng)

        try:
            bench_chained(f"B=1 bootstrap [{tag}]", boot, c1)
            last_ctx = bench_fused_nand(tag, ckm, sk, eng)
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] FAILED {type(e).__name__}: {e}", flush=True)
        if tag != builders[-1][0]:
            last_ctx = None
        del ckm
        gc.collect()

    # 3. fused 3-gate expression (2 dispatches) on the last mode.
    if last_ctx is not None:
        ev = FusedEvaluator(last_ctx)
        ast = nander.parse_logic_expr("(1 & 0) ^ !0")
        nonce = lambda: np.random.randint(0, 2**31, P.n)
        assert ev.eval_bit(ast, _nonce=nonce()) == 1
        t0 = time.perf_counter()
        for _ in range(ITERS):
            assert ev.eval_bit(ast, _nonce=nonce()) == 1
        print(f"fused 3-gate expr [{builders[-1][0]}]: "
              f"{(time.perf_counter() - t0) / ITERS * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
