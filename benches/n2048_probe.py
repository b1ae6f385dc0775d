"""Probe: fused Karatsuba CMux step at N=2048 (param-sweep config 5).

Round 1 ran the N=2048 sweep on the XLA matmul engine (107 gates/s) because
the original fused kernel was N<=1024.  The Karatsuba kernels' panel tables
fit the raised VMEM cap at N=2048 (levels=1: 35.4 MB, levels=2: 49.5 MB);
this probe checks on-device exactness and measures ms/step.

Usage: python benches/n2048_probe.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rustfhe_tpu import poly as rpoly, trgsw as rtrgsw  # noqa: E402
from rustfhe_tpu.engine import get_engine  # noqa: E402
from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine  # noqa: E402
from rustfhe_tpu.params import N2048_PARAMS as P  # noqa: E402

U32 = jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = 16


def main():
    rs = np.random.RandomState(7)
    print(f"# device: {jax.devices()[0]}  B={B}  N={P.N}", flush=True)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(2 * P.l, 2, P.N), dtype=np.uint64).astype(np.uint32))
    acc = jnp.asarray(
        rs.randint(0, 2**32, size=(256, 2, P.N), dtype=np.uint64).astype(np.uint32))
    ai = jnp.asarray(rs.randint(0, 2 * P.N, size=(256,)).astype(np.int32))

    m = get_engine("matmul")
    rot = rpoly.rotate_binary(acc, ai[:, None])
    diff = (rot - acc).astype(U32)
    want = (acc + m.external_product_digits(
        m.prepare_trgsw(rows, P), rtrgsw.decompose_trlwe(diff, P), P)).astype(U32)

    acc0 = jnp.asarray(
        rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))

    for levels in (1, 2):
        eng = PallasKaratsubaEngine(levels=levels)
        try:
            prep = eng.prepare_trgsw(rows, P)
            got = eng.scan_exit(
                eng.cmux_step(prep, eng.scan_enter(acc, P), ai, P), P)
            ok = np.array_equal(np.asarray(got), np.asarray(want))
        except Exception as e:
            print(f"levels={levels} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"levels={levels} exact on device: {ok}", flush=True)
        if not ok:
            continue
        flat0 = jax.block_until_ready(eng.scan_enter(acc0, P))

        @jax.jit
        def run(a, eng=eng, prep=prep):
            return jax.lax.fori_loop(
                0, STEPS, lambda i, s: eng.cmux_step(prep, s, a_t, P), a)

        jax.block_until_ready(run(flat0))
        t0 = time.perf_counter()
        y = flat0
        for _ in range(3):
            y = run(y)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / (3 * STEPS)
        gps = B / (dt * P.n)
        print(f"levels={levels}: {dt*1e3:.3f} ms/step -> ~{gps:,.0f} gates/s "
              f"at B={B}", flush=True)


if __name__ == "__main__":
    main()
