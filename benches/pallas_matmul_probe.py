"""Probe: Pallas blocked int8 matmul vs XLA jnp.dot at the external-product
shape (B, 6144) @ (6144, 8192) -> int32.  Chained timing (the relay caches
identical executions)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K, N = 6144, 8192
rs = np.random.RandomState(0)
c8 = jnp.asarray(rs.randint(-128, 128, size=(K, N)).astype(np.int8))
d0 = jnp.asarray(rs.randint(-32, 32, size=(B, K)).astype(np.int8))


def chain(name, f, x0, iters=8):
    x = jax.block_until_ready(f(x0))
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms  {2*B*K*N/dt/1e12:6.1f} TOPS", flush=True)


def feedback(y):
    # (B, N) i32 -> (B, K) int8 cheap map to keep the chain data-dependent
    return ((y[:, :K] & 63) - 32).astype(jnp.int8)


# XLA reference
chain("xla jnp.dot int8", jax.jit(lambda d: feedback(jnp.dot(d, c8, preferred_element_type=jnp.int32))), d0)


def make_pallas(tb, tn, tk):
    def kernel(d_ref, c_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(d_ref[:], c_ref[:], preferred_element_type=jnp.int32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    grid = (B // tb, N // tn, K // tk)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(flops=2 * B * K * N, bytes_accessed=B * K + K * N + B * N * 4, transcendentals=0),
    )


for tb, tn, tk in [(256, 512, 1024), (512, 1024, 768), (256, 1024, 1536), (1024, 512, 512)]:
    try:
        f = make_pallas(tb, tn, tk)
        chain(f"pallas tb={tb} tn={tn} tk={tk}", jax.jit(lambda d, f=f: feedback(f(d, c8))), d0)
    except Exception as e:
        print(f"pallas tb={tb} tn={tn} tk={tk} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
