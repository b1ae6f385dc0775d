"""Mosaic de-risk probe for the round-2 Nussbaumer engine (ROADMAP.md
lever 1): verifies that the transform's primitive operations compile and
run EXACTLY inside a Pallas TPU kernel:

  * in-block negacyclic roll of 64-wide lane blocks, built from two
    full-row ``pltpu.roll``s + a lane-position mask (the Z^t twiddle),
  * adjacent-block butterflies via 64-aligned strided slices (the radix-2
    FFT stage over A = Z[Z]/(Z^64+1)).

Result on TPU v5e (2026-08-17): compiles, bit-exact vs the host reference.
Standalone per-call time is dispatch-dominated and not meaningful; these
ops are VPU-cheap inside a fused kernel.
"""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32, I32 = jnp.uint32, jnp.int32
tb, R, BL = 128, 32, 64
W = R * BL
S = 17  # twiddle shift under test


def block_neg_roll_host(x, s):
    x = x.reshape(tb, R, BL)
    out = np.empty_like(x)
    for t in range(BL):
        src = (t - s) % BL
        out[:, :, t] = x[:, :, src] if t - s >= 0 else (~x[:, :, src] + np.uint32(1))
    return out.reshape(tb, W)


def butterfly_host(x):
    x = x.reshape(tb, R, BL)
    a, b = x[:, 0::2].copy(), x[:, 1::2].copy()
    out = np.empty_like(x)
    out[:, 0::2] = a + b
    out[:, 1::2] = a - b
    return out.reshape(tb, W)


def kernel(x_ref, o_ref):
    x = x_ref[:]
    lane = jax.lax.broadcasted_iota(I32, (tb, W), 1) % BL
    r1 = pltpu.roll(x, S, axis=1)
    r2 = pltpu.roll(x, (S - BL) % W, axis=1)
    rolled = jnp.where(lane >= S, r1, (~r2 + U32(1)).astype(U32))
    xr = rolled.reshape(tb, R // 2, 2 * BL)
    a, b = xr[:, :, :BL], xr[:, :, BL:]
    o_ref[:] = jnp.concatenate([a + b, a - b], axis=2).reshape(tb, W)


def main():
    rs = np.random.RandomState(0)
    x0 = rs.randint(0, 2**32, size=(tb, W), dtype=np.uint64).astype(np.uint32)
    f = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((tb, W), U32))
    got = np.asarray(jax.block_until_ready(jax.jit(f)(jnp.asarray(x0))))
    want = butterfly_host(block_neg_roll_host(x0, S))
    print("compiles: yes; exact:", np.array_equal(got, want))


if __name__ == "__main__":
    main()
