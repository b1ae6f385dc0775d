"""Per-kernel microbenchmarks: the speed-of-light accounting harness.

Times each stage of the bootstrap pipeline in isolation on the default
device, with achieved-vs-peak roofline notes (BASELINE.json: "every
field-arithmetic kernel benchmarked at speed-of-light per chip").

Usage: python benches/kernels.py [batch ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rustfhe_tpu import keys, poly, trgsw  # noqa: E402
from rustfhe_tpu.bootstrap import blind_rotate, identity_key_switch  # noqa: E402
from rustfhe_tpu.decomp import decompose_signed  # noqa: E402
from rustfhe_tpu.engine import get_engine  # noqa: E402
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402
from rustfhe_tpu.utils.timing import time_fn  # noqa: E402

U32 = jnp.uint32


def report(label, seconds, work=None):
    line = f"{label:36s} {seconds * 1e3:10.3f} ms"
    if work:
        line += f"   {work}"
    print(line, flush=True)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [512, 2048]
    engine = get_engine("matmul")
    rs = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    print(f"# device: {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    sk, ck = keys.gen_keys(key, P, engine_name="matmul")
    jax.block_until_ready(ck)
    report("keygen (total, incl compile)", time.perf_counter() - t0)

    bk1 = jax.tree.map(lambda x: x[0], ck.bk)  # single prepared TRGSW

    for B in batches:
        print(f"\n## batch = {B}", flush=True)
        acc = jnp.asarray(
            rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64).astype(np.uint32)
        )
        amounts = jnp.asarray(rs.randint(0, 2 * P.N, size=(B, 1)).astype(np.int32))

        # rotate
        f = jax.jit(lambda a, n: poly.rotate(a, n))
        t, _ = time_fn(f, acc, amounts)
        report("rotate (B,2,N)", t, f"{B*2*P.N*4/t/1e9:.1f} GB/s")

        # decompose
        f = jax.jit(lambda a: trgsw.decompose_trlwe(a, P))
        t, _ = time_fn(f, acc)
        report("decompose (B,2,N)->(B,2L,N)", t, f"{B*2*P.N*4/t/1e9:.1f} GB/s in")

        # external product (one blind-rotate step's compute)
        digits = jax.jit(lambda a: trgsw.decompose_trlwe(a, P))(acc)
        f = jax.jit(lambda d: engine.external_product_digits(bk1, d, P))
        t, _ = time_fn(f, digits)
        macs = B * (2 * P.l * P.N) * (2 * engine.num_limbs * P.N)
        report("external product step", t, f"{2*macs/t/1e12:.1f} TOPS (peak ~394 int8)")

        # full blind rotate (n steps)
        cts = jnp.asarray(
            rs.randint(0, 2**32, size=(B, P.n + 1), dtype=np.uint64).astype(np.uint32)
        )
        from rustfhe_tpu import trlwe

        testvec = trlwe.trivial(jnp.full((P.N,), P.mu, U32))
        f = jax.jit(lambda c: blind_rotate(c, ck.bk, testvec, P, engine))
        t, _ = time_fn(f, cts)
        report("blind rotate (full scan)", t, f"{t/P.n*1e6:.0f} us/step; {B/t:,.0f} gates/s")

        # key switch
        lv1 = jnp.asarray(
            rs.randint(0, 2**32, size=(B, P.N + 1), dtype=np.uint64).astype(np.uint32)
        )
        f = jax.jit(lambda c: identity_key_switch(c, ck.ksk, P, engine))
        t, _ = time_fn(f, lv1)
        report("identity key switch", t, f"{B/t:,.0f} switches/s")


if __name__ == "__main__":
    main()
