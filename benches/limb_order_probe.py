"""A/B probe: per-(j,l) limb shift-adds (j-outer) vs hoisted recombination
(limb-outer, one shift-add per (c,l)) in the merged CMux-step kernel.

Same-session comparison — cross-session numbers drift with machine state.
Usage: python benches/limb_order_probe.py [B]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from rustfhe_tpu.engine.pallas_step import (  # noqa: E402
    _COMPILER_PARAMS,
    _rotate_binary_inkernel,
    build_panels,
)
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402

I8, I32, U32 = jnp.int8, jnp.int32, jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = 16
MACS = 2 * P.l * P.N * 2 * 4 * P.N


def kernel(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, tb, tm, limb_outer):
    b = pl.program_id(0)
    N, lvls = P.N, P.l
    mask, half, dmask = U32(P.decomp_mask), U32(P.half_bg), U32(P.bg - 1)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    n_col = n_ref[:, 0:1]
    accs = [acc_ref[:, p, :] for p in (0, 1)]
    digs = []
    for p in (0, 1):
        rot = _rotate_binary_inkernel(accs[p], n_col, N)
        u = ((rot - accs[p]).astype(U32) + mask) ^ mask
        for lv in range(lvls):
            raw = (u >> U32(32 - P.bgbit * (lv + 1))) & dmask
            digs.append((raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32).astype(I8))

    def dot_group(dig, c, j, l):
        part = jnp.zeros((tb, N), I32)
        r0 = (j * 4 + l) * tm
        for mb in range(N // tm):
            d_blk = dig[:, mb * tm : (mb + 1) * tm]
            col0 = (N - tm) - mb * tm
            part += jnp.dot(d_blk, w_vmem[c, r0 : r0 + tm, col0 : col0 + N],
                            preferred_element_type=I32)
        return part

    for c in (0, 1):
        acc_out = jnp.zeros((tb, N), U32)
        if limb_outer:
            for l in range(4):
                part = jnp.zeros((tb, N), I32)
                for j in range(2 * lvls):
                    part += dot_group(digs[j], c, j, l)
                acc_out = acc_out + (part.astype(U32) << U32(8 * l))
        else:
            for j in range(2 * lvls):
                for l in range(4):
                    part = dot_group(digs[j], c, j, l)
                    acc_out = acc_out + (part.astype(U32) << U32(8 * l))
        o_ref[:, c, :] = accs[c] + acc_out


def make_step(panels, a_t, tb, tm, limb_outer):
    rows, width = 2 * P.l * 4 * tm, 2 * P.N - tm
    n2 = a_t.astype(I32).reshape(B, 1)

    def step(acc):
        return pl.pallas_call(
            functools.partial(kernel, tb=tb, tm=tm, limb_outer=limb_outer),
            out_shape=jax.ShapeDtypeStruct((B, 2, P.N), U32),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tb, 2, P.N), lambda b: (b, 0, 0)),
                pl.BlockSpec((tb, 1), lambda b: (b, 0)),
            ],
            out_specs=pl.BlockSpec((tb, 2, P.N), lambda b: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((2, rows, width), I8),
                            pltpu.SemaphoreType.DMA(())],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * MACS,
                bytes_accessed=B * 2 * P.N * 4 * 2 + 2 * rows * width,
                transcendentals=0),
            compiler_params=_COMPILER_PARAMS,
        )(panels, acc, n2)

    return step


def chain(name, step_fn, x0):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, STEPS, lambda i, s: step_fn(s), a)

    jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    y = x0
    for _ in range(3):
        y = run(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / (3 * STEPS)
    print(f"{name:32s} {dt*1e3:9.3f} ms/step   {2*B*MACS/dt/1e12:6.1f} TOPS-equiv",
          flush=True)
    return dt


def main():
    rs = np.random.RandomState(0)
    print(f"# device: {jax.devices()[0]}  B={B}", flush=True)
    acc0 = jnp.asarray(rs.randint(0, 2**32, size=(B, 2, P.N),
                                  dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))
    qd = jnp.asarray(rs.randint(-128, 128, size=(2, 2 * P.l * 4, 2 * P.N)
                                ).astype(np.int8))
    panels = jax.block_until_ready(build_panels(qd, P, 128))
    for rep in range(2):
        for lo in (False, True):
            chain(f"rep{rep} {'limb-outer' if lo else 'j-outer'} tb=128",
                  make_step(panels, a_t, 128, 128, lo), acc0)


if __name__ == "__main__":
    main()
