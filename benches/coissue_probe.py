"""Probe: can Mosaic co-issue VPU work of one sub-tile with MXU dots of
another?  The fused CMux kernel is serialization-bound (VPU ~1.2 ms + MXU
floor 1.18 ms at levels=2, measured 2.38 total => only ~0.8 ms overlaps).

Variants (levels=2 kernel, tb=128 split into 2 sub-tiles of 64):
  baseline     production fused_cmux_step_k (tb=128, no split)
  split-serial rotate+decompose(sub0), dots(sub0), rotate+decompose(sub1),
               dots(sub1) — the naive order
  split-groups rotate+decompose(sub0); then rotate+decompose(sub1) emitted
               BEFORE dots(sub0); dots(sub0); dots(sub1) — gives the
               scheduler a window to co-issue sub1's VPU with sub0's MXU

Usage: python benches/coissue_probe.py [B]
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

from rustfhe_tpu.engine.pallas_k import (  # noqa: E402
    PallasKaratsubaEngine,
    _karatsuba_accumulate,
    _rotate_res_inkernel,
    fused_cmux_step_k,
    tree_planes,
)
from rustfhe_tpu.engine.pallas_step import (  # noqa: E402
    _COMPILER_PARAMS,
    build_panels_doubling,
)
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402

I8, I32, U32 = jnp.int8, jnp.int32, jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = 16
LEVELS = 2
MACS_FULL = 2 * P.l * P.N * 2 * 4 * P.N


def vpu_stage(acc, n_col, params, levels):
    R = 1 << levels
    ns = params.N // R
    lvls = params.l
    mask, half, dmask = U32(params.decomp_mask), U32(params.half_bg), U32(params.bg - 1)
    rot = _rotate_res_inkernel(acc, n_col, ns, levels)
    u = ((rot - acc).astype(U32) + mask) ^ mask
    dig_planes = []
    for lv in range(lvls):
        raw = (u >> U32(32 - params.bgbit * (lv + 1))) & dmask
        dig_planes.append((raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32))
    dj = []
    for p in (0, 1):
        base = R * p * ns
        for lv in range(lvls):
            d = dig_planes[lv]
            res = [d[:, base + i * ns : base + (i + 1) * ns] for i in range(R)]
            dj.append([x.astype(I8) for x in tree_planes(res, lambda a, b: a + b)])
    return dj


def mxu_stage(dj, w_vmem, acc, o_ref, row0, params, levels, sub_tb):
    R = 1 << levels
    ns = params.N // R
    for c in (0, 1):
        outs = _karatsuba_accumulate(
            dj, w_vmem, c, ns=ns, lvls=params.l, T=3 ** levels,
            num_limbs=4, limb_bits=8, tm=128, tb=sub_tb,
        )
        for i in range(R):
            seg = slice((R * c + i) * ns, (R * c + i + 1) * ns)
            o_ref[row0 : row0 + sub_tb, seg] = acc[:, seg] + outs[i]


def kernel_split(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params, tb,
                 grouped):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    h = tb // 2
    accs = [acc_ref[0:h, :], acc_ref[h:tb, :]]
    ncols = [n_ref[0:h, 0:1], n_ref[h:tb, 0:1]]
    if grouped:
        dj0 = vpu_stage(accs[0], ncols[0], params, LEVELS)
        dj1 = vpu_stage(accs[1], ncols[1], params, LEVELS)
        mxu_stage(dj0, w_vmem, accs[0], o_ref, 0, params, LEVELS, h)
        mxu_stage(dj1, w_vmem, accs[1], o_ref, h, params, LEVELS, h)
    else:
        for s in (0, 1):
            dj = vpu_stage(accs[s], ncols[s], params, LEVELS)
            mxu_stage(dj, w_vmem, accs[s], o_ref, s * h, params, LEVELS, h)


def make_split(panels, a_t, tb, grouped):
    T = 3 ** LEVELS
    ns = P.N >> LEVELS
    rows = 2 * P.l * 4 * T * 128
    width = 2 * ns - 128
    n2 = a_t.astype(I32).reshape(B, 1)

    def step(acc):
        return pl.pallas_call(
            functools.partial(kernel_split, params=P, tb=tb, grouped=grouped),
            out_shape=jax.ShapeDtypeStruct((B, 2 * P.N), U32),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tb, 2 * P.N), lambda b: (b, 0)),
                pl.BlockSpec((tb, 1), lambda b: (b, 0)),
            ],
            out_specs=pl.BlockSpec((tb, 2 * P.N), lambda b: (b, 0)),
            scratch_shapes=[pltpu.VMEM((2, rows, width), I8),
                            pltpu.SemaphoreType.DMA(())],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * 2 * (2 * P.l) * 4 * T * ns * ns,
                bytes_accessed=B * 2 * P.N * 4 * 2 + 2 * rows * width,
                transcendentals=0),
            compiler_params=_COMPILER_PARAMS,
        )(panels, acc, n2)

    return step


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
    print(f"# device: {jax.devices()[0]}  B={B}  levels={LEVELS}", flush=True)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(2 * P.l, 2, P.N), dtype=np.uint64).astype(np.uint32))
    ke = PallasKaratsubaEngine(tb=128, levels=LEVELS)
    prep = ke.prepare_trgsw(rows, P)
    panels = jax.block_until_ready(build_panels_doubling(prep, P.N >> LEVELS, 128))

    acc0 = jnp.asarray(
        rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))
    flat0 = jax.block_until_ready(ke.scan_enter(acc0, P))
    n2 = a_t.astype(I32)

    # correctness of the split kernels vs the production kernel
    want = np.asarray(fused_cmux_step_k(
        flat0[:256], n2[:256], panels, params=P, levels=LEVELS, tb=128))
    for grouped in (False, True):
        got = np.asarray(make_split(panels, a_t, 128, grouped)(flat0)[:256])
        tag = "grouped" if grouped else "serial"
        print(f"split-{tag} exact: {np.array_equal(got, want)}", flush=True)

    chain("baseline (prod k2, tb=128)",
          lambda a: fused_cmux_step_k(a, n2, panels, params=P, levels=LEVELS, tb=128),
          flat0)
    chain("split-serial (2x64)", make_split(panels, a_t, 128, False), flat0)
    chain("split-grouped (2x64)", make_split(panels, a_t, 128, True), flat0)
    chain("baseline tb=256",
          lambda a: fused_cmux_step_k(a, n2, panels, params=P, levels=LEVELS, tb=256),
          flat0)


if __name__ == "__main__":
    main()
