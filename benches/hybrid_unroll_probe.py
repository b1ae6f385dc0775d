"""Probe: HYBRID 2-step unroll — odd-step panels prebuilt, even built per step.

Context (ROADMAP refuted levers): the in-kernel 2-step unroll wins only with
prebuilt panels (2.114 vs 2.185 ms/step same-session), but prebuilding ALL
panels costs 12.6 GiB and caps the batch at 16384 — below the B=131072
throughput point — while per-step building BOTH panels of a pair serializes
one doubled XLA build region before the kernel (2.415 ms/step, rejected).

The untried middle: prebuild panels for the ODD key bits only (~6.7 GB — half
the latency-mode table) and run the scan as 317 two-step pairs + 1 leftover
step, each pair building ONE panel per iteration (same per-iteration build
exposure as the production single-step scan) while halving the acc HBM
round trips and the scan dispatch count.

Measures, same session, real lax.scan over all 635 steps:
  * production single-step scan (fused_cmux_step_k, per-step build),
  * hybrid pair scan (step_var unroll=2, extract_sar, stacked panels).
Exactness of the hybrid pair vs two production steps is asserted ON DEVICE
before timing.  Usage: python benches/hybrid_unroll_probe.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benches.vpu_reduce_probe import step_var  # noqa: E402
from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine  # noqa: E402
from rustfhe_tpu.engine.pallas_step import build_panels_doubling  # noqa: E402
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402

I32, U32 = jnp.int32, jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
TM = 128


def main():
    rs = np.random.RandomState(11)
    print(f"# device: {jax.devices()[0]}  B={B}  n={P.n}", flush=True)
    eng = PallasKaratsubaEngine(levels=2)
    ns = P.N >> 2

    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(P.n, 2 * P.l, 2, P.N), dtype=np.uint64
                   ).astype(np.uint32))
    prepared = jax.block_until_ready(eng.prepare_trgsw(rows, P))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(P.n, B)).astype(np.int32))
    acc0 = eng.scan_enter(
        jnp.asarray(rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64
                               ).astype(np.uint32)), P)

    npairs = (P.n - 1) // 2  # 317 pairs cover steps 0..633; step 634 single
    prep_even = prepared[0:2 * npairs:2]
    t0 = time.perf_counter()
    panels_odd = jax.block_until_ready(jax.lax.map(
        lambda q: build_panels_doubling(q, ns, TM), prepared[1:2 * npairs:2]))
    print(f"# prebuilt odd panels: {panels_odd.nbytes / 2**30:.2f} GiB "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)
    a_pairs = jnp.moveaxis(a_t[: 2 * npairs].reshape(npairs, 2, B), 1, 2)

    def prod_step(acc, xs):
        prep_i, a_i = xs
        return eng.cmux_step(prep_i, acc, a_i, P), None

    # Everything scan-carried rides as ARGUMENTS: closure captures become
    # program constants, which the remote-compile relay must upload with
    # the program (HTTP 413 at large B; the 6.7 GiB panel table always).
    @jax.jit
    def prod_scan_impl(acc, prep, at):
        out, _ = jax.lax.scan(prod_step, acc, (prep, at))
        return out

    def prod_scan(acc):
        return prod_scan_impl(acc, prepared, a_t)

    def hyb_pair(acc, xs):
        prep_e, pan_o, a2 = xs
        pan_e = build_panels_doubling(prep_e, ns, TM)
        panels = jnp.stack([pan_e, pan_o])
        return step_var(acc, a2, panels, params=P, unroll=2,
                        extract_sar=True), None

    @jax.jit
    def hyb_scan_impl(acc, pe, pans, ap, prep_last, a_last):
        out, _ = jax.lax.scan(hyb_pair, acc, (pe, pans, ap))
        out = eng.cmux_step(prep_last, out, a_last, P)
        return out

    def hyb_scan(acc):
        return hyb_scan_impl(acc, prep_even, panels_odd, a_pairs,
                             prepared[P.n - 1], a_t[P.n - 1])

    # ---- exactness on device: one hybrid pair == two production steps ----
    small = acc0[:256]
    want = eng.cmux_step(prepared[0], small, a_t[0, :256], P)
    want = np.asarray(eng.cmux_step(prepared[1], want, a_t[1, :256], P))
    got = np.asarray(step_var(
        small, a_pairs[0, :256], jnp.stack(
            [build_panels_doubling(prep_even[0], ns, TM), panels_odd[0]]),
        params=P, unroll=2, extract_sar=True))
    assert np.array_equal(got, want), "hybrid pair != two production steps"
    print("# exactness: hybrid pair bit-equal to two production steps", flush=True)

    # ---- timing: full 635-step scans, data-chained across runs ----------
    for name, fn in [("production 1-step scan", prod_scan),
                     ("hybrid pair scan", hyb_scan)]:
        try:
            jax.block_until_ready(fn(acc0))
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        t0 = time.perf_counter()
        y = acc0
        for _ in range(2):
            y = fn(y)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / (2 * P.n)
        print(f"{name:28s} {dt * 1e3:7.3f} ms/step  "
              f"({dt * P.n:6.2f} s/rotation, B={B})", flush=True)


if __name__ == "__main__":
    main()
