"""On-device probe for the Karatsuba e/o fused CMux-step kernel.

1. Exactness: fused_cmux_step_k vs the composed XLA matmul path on REAL
   random data (the int8 MXU + int32 recombine must be bit-exact mod 2^32).
2. Speed: chained steps (panels prebuilt AND rebuilt-per-step fastbuild)
   vs the production non-Karatsuba merged kernel, same session.

Usage: python benches/karatsuba_probe.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rustfhe_tpu import poly as rpoly, trgsw as rtrgsw  # noqa: E402
from rustfhe_tpu.engine import get_engine  # noqa: E402
from rustfhe_tpu.engine.pallas_k import (  # noqa: E402
    PallasKaratsubaEngine,
    fused_cmux_step_k,
)
from rustfhe_tpu.engine.pallas_step import (  # noqa: E402
    PallasEngine,
    build_panels_doubling,
    build_panels_fast,
    fused_cmux_step_merged,
)
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402

I8, I32, U32 = jnp.int8, jnp.int32, jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = 16
MACS_FULL = 2 * P.l * P.N * 2 * 4 * P.N  # reference MAC count per gate-step


def chain(name, step_fn, x0):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, STEPS, lambda i, s: step_fn(s), a)

    try:
        jax.block_until_ready(run(x0))
    except Exception as e:
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    y = x0
    for _ in range(3):
        y = run(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / (3 * STEPS)
    print(f"{name:36s} {dt*1e3:9.3f} ms/step   {2*B*MACS_FULL/dt/1e12:6.1f} TOPS-equiv(ref-MACs)",
          flush=True)


def main():
    rs = np.random.RandomState(7)
    print(f"# device: {jax.devices()[0]}  B={B}", flush=True)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(2 * P.l, 2, P.N), dtype=np.uint64).astype(np.uint32))
    acc = jnp.asarray(
        rs.randint(0, 2**32, size=(256, 2, P.N), dtype=np.uint64).astype(np.uint32))
    ai = jnp.asarray(rs.randint(0, 2 * P.N, size=(256,)).astype(np.int32))

    # ---- exactness on device ----
    m = get_engine("matmul")
    rot = rpoly.rotate_binary(acc, ai[:, None])
    diff = (rot - acc).astype(U32)
    want = (acc + m.external_product_digits(
        m.prepare_trgsw(rows, P), rtrgsw.decompose_trlwe(diff, P), P)).astype(U32)

    ke = PallasKaratsubaEngine(tb=128)
    prep_k = ke.prepare_trgsw(rows, P)
    got = ke.scan_exit(ke.cmux_step(prep_k, ke.scan_enter(acc, P), ai, P), P)
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"karatsuba step exact on device: {ok}", flush=True)
    if not ok:
        bad = np.argwhere(np.asarray(got) != np.asarray(want))
        print(f"  mismatches: {len(bad)} first={bad[:3]}", flush=True)
        return

    # ---- speed ----
    acc0 = jnp.asarray(
        rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))

    pe = PallasEngine(tb=128)
    prep_old = pe.prepare_trgsw(rows, P)
    panels_old = jax.block_until_ready(build_panels_fast(prep_old, P, 128))
    panels_k = jax.block_until_ready(build_panels_doubling(prep_k, P.N // 2, 128))
    flat0 = jax.block_until_ready(ke.scan_enter(acc0, P))
    n2 = a_t.astype(I32)

    chain("merged (prod, prebuilt panels)",
          lambda a: fused_cmux_step_merged(a, a_t, panels_old, params=P, tb=128),
          acc0)
    chain("karatsuba (prebuilt panels)",
          lambda a: fused_cmux_step_k(a, n2, panels_k, params=P, tb=128),
          flat0)

    def step_fastbuild_old(a):
        z = jnp.minimum(a[0, 0, 0], U32(0)).astype(I8)
        pw = build_panels_fast(prep_old + z, P, 128)
        return fused_cmux_step_merged(a, a_t, pw, params=P, tb=128)

    def step_fastbuild_k(a):
        z = jnp.minimum(a[0, 0], U32(0)).astype(I8)
        pw = build_panels_doubling(prep_k + z, P.N // 2, 128)
        return fused_cmux_step_k(a, n2, pw, params=P, tb=128)

    chain("merged + fastbuild (prod path)", step_fastbuild_old, acc0)
    chain("karatsuba + fastbuild", step_fastbuild_k, flat0)
    for tb in (256, 512):
        chain(f"karatsuba tb={tb} (prebuilt)",
              lambda a, tb=tb: fused_cmux_step_k(a, n2, panels_k, params=P, tb=tb),
              flat0)


if __name__ == "__main__":
    main()
