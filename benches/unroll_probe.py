"""Probe: in-kernel step unrolling x panel-build exposure.

After the leaf-u32 combine landed (2.76 -> 2.19 ms/step prebuilt), the
per-step panel build is no longer fully hidden (fastbuild 2.43 vs prebuilt
2.19).  This probe measures unroll2/unroll4 with prebuilt AND per-step-built
panels, plus a nodots VPU floor for the leaf-u32 kernel.

Usage: python benches/unroll_probe.py [B]
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
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = 16


def bench(name, run, x0):
    try:
        jax.block_until_ready(run(x0))
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    t0 = time.perf_counter()
    y = x0
    for _ in range(3):
        y = run(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / (3 * STEPS)
    print(f"{name:44s} {dt*1e3:9.3f} ms/step", flush=True)


def main():
    rs = np.random.RandomState(7)
    print(f"# device: {jax.devices()[0]}  B={B}", flush=True)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(2 * P.l, 2, P.N), dtype=np.uint64).astype(np.uint32))
    k2 = PallasKaratsubaEngine(levels=2)
    prep2 = k2.prepare_trgsw(rows, P)
    panels2 = jax.block_until_ready(build_panels_doubling(prep2, P.N >> 2, 128))

    acc0 = jnp.asarray(
        rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))
    flat0 = jax.block_until_ready(k2.scan_enter(acc0, P))

    def loop(fn, iters):
        @jax.jit
        def run(a):
            return jax.lax.fori_loop(0, iters, lambda i, s: fn(s), a)
        return run

    # Baselines
    bench("k2 unroll1 prebuilt",
          loop(lambda a: step_var(a, a_t, panels2, params=P), STEPS), flat0)

    def fastbuild1(a):
        z = jnp.minimum(a[0, 0], U32(0)).astype(jnp.int8)
        pw = build_panels_doubling(prep2 + z, P.N >> 2, 128)
        return step_var(a, a_t, pw, params=P)

    bench("k2 unroll1 fastbuild", loop(fastbuild1, STEPS), flat0)

    # unroll2
    a_t2 = jnp.stack([a_t, a_t], axis=1)
    panels_u2 = jnp.stack([panels2, panels2])
    bench("k2 unroll2 prebuilt",
          loop(lambda a: step_var(a, a_t2, panels_u2, params=P, unroll=2),
               STEPS // 2), flat0)

    prep_u2 = jnp.stack([prep2, prep2])  # (2, 2, R, 2ns)

    def fastbuild2(a):
        z = jnp.minimum(a[0, 0], U32(0)).astype(jnp.int8)
        pw = build_panels_doubling(prep_u2 + z, P.N >> 2, 128)
        return step_var(a, a_t2, pw, params=P, unroll=2)

    bench("k2 unroll2 fastbuild", loop(fastbuild2, STEPS // 2), flat0)

    # unroll4
    a_t4 = jnp.stack([a_t] * 4, axis=1)
    panels_u4 = jnp.stack([panels2] * 4)
    bench("k2 unroll4 prebuilt",
          loop(lambda a: step_var(a, a_t4, panels_u4, params=P, unroll=4),
               STEPS // 4), flat0)

    prep_u4 = jnp.stack([prep2] * 4)

    def fastbuild4(a):
        z = jnp.minimum(a[0, 0], U32(0)).astype(jnp.int8)
        pw = build_panels_doubling(prep_u4 + z, P.N >> 2, 128)
        return step_var(a, a_t4, pw, params=P, unroll=4)

    bench("k2 unroll4 fastbuild", loop(fastbuild4, STEPS // 4), flat0)


if __name__ == "__main__":
    main()
