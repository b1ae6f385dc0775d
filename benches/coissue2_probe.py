"""Probe: VPU/MXU co-issue restructurings of the Karatsuba-2 step kernel.

The kernel's dependency chain is rotate -> decompose -> digit tree -> dots
-> combine; all digit-tree VPU work currently happens before any MXU dot.
If Mosaic schedules mostly in program order, interleaving per-LEAF operand
building with the previous leaf's dots should hide VPU time behind the MXU
(floor 1.18 ms vs measured 2.19 prebuilt => up to ~1 ms recoverable).

Variants (exactness asserted on device before timing):
  A. baseline: all 54 tree planes upfront (production order)
  B. per-leaf just-in-time: build leaf t's 6 operand planes, then its dots
  C. software-pipelined: build leaf t+1's planes between leaf t's dot groups

Usage: python benches/coissue2_probe.py [B]
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

from benches.vpu_reduce_probe import step_var  # noqa: E402  (baseline A)
from rustfhe_tpu import poly as rpoly, trgsw as rtrgsw  # noqa: E402
from rustfhe_tpu.engine import get_engine  # noqa: E402
from rustfhe_tpu.engine.pallas_k import (  # noqa: E402
    PallasKaratsubaEngine,
    _rotate_res_inkernel,
    _shiftz1_u32,
    tree_combine,
)
from rustfhe_tpu.engine.pallas_step import (  # noqa: E402
    _COMPILER_PARAMS,
    build_panels_doubling,
)
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402

I8, I32, U32 = jnp.int8, jnp.int32, jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = 16
K = 4
# leaf t -> residue subset (tree_planes order at levels=2)
LEAF_SUBSETS = [(0,), (2,), (0, 2), (1,), (3,), (1, 3), (0, 1), (2, 3), (0, 1, 2, 3)]


def _kernel_coissue(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params, tb,
                    tm, pipelined):
    b = pl.program_id(0)
    levels, R, T = 2, 4, 9
    ns = params.N // R
    lvls = params.l
    mask = U32(params.decomp_mask)
    half = U32(params.half_bg)
    digit_mask = U32(params.bg - 1)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    n_col = n_ref[:, 0:1]
    acc = acc_ref[:, :]
    rot = _rotate_res_inkernel(acc, n_col, ns, levels)
    u = ((rot - acc).astype(U32) + mask) ^ mask

    dig_planes = []
    for lv in range(lvls):
        shift = U32(32 - params.bgbit * (lv + 1))
        raw = (u >> shift) & digit_mask
        dig_planes.append((raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32))

    def build_leaf(t):
        """6 int8 operand planes (j = p*lvls + lv) for leaf t."""
        subset = LEAF_SUBSETS[t]
        out = []
        for p_ in (0, 1):
            base = R * p_ * ns
            for lv in range(lvls):
                d = dig_planes[lv]
                s = None
                for i in subset:
                    seg = d[:, base + i * ns : base + (i + 1) * ns]
                    s = seg if s is None else s + seg
                out.append(s.astype(I8))
        return out

    def leaf_dots(c, t, planes):
        leaf = None
        for l in range(K):
            part = jnp.zeros((tb, ns), I32)
            for j in range(2 * lvls):
                r0 = ((j * K + l) * T + t) * tm
                for mb in range(ns // tm):
                    d_blk = planes[j][:, mb * tm : (mb + 1) * tm]
                    col0 = (ns - tm) - mb * tm
                    w_blk = w_vmem[c, r0 : r0 + tm, col0 : col0 + ns]
                    part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
            contrib = part.astype(U32) if l == 0 else (part.astype(U32) << U32(8 * l))
            leaf = contrib if leaf is None else leaf + contrib
        return leaf

    for c in (0, 1):
        leaves = []
        if pipelined:
            planes = build_leaf(0)
            for t in range(T):
                nxt = build_leaf(t + 1) if t + 1 < T else None
                leaves.append(leaf_dots(c, t, planes))
                planes = nxt
        else:
            for t in range(T):
                leaves.append(leaf_dots(c, t, build_leaf(t)))
        outs = tree_combine(leaves, lambda v: _shiftz1_u32(v, ns))
        for i in range(R):
            seg = slice((R * c + i) * ns, (R * c + i + 1) * ns)
            o_ref[:, seg] = acc_ref[:, seg] + outs[i]


@functools.partial(jax.jit, static_argnames=("params", "tb", "tm", "pipelined"))
def step_coissue(acc_flat, a_tilde, panels, *, params, tb=128, tm=128,
                 pipelined=False):
    B_ = acc_flat.shape[0]
    ns = params.N >> 2
    rows = 2 * params.l * K * 9 * tm
    width = 2 * ns - tm
    assert panels.shape == (2, rows, width), panels.shape
    return pl.pallas_call(
        functools.partial(_kernel_coissue, params=params, tb=tb, tm=tm,
                          pipelined=pipelined),
        out_shape=jax.ShapeDtypeStruct((B_, 2 * params.N), U32),
        grid=(B_ // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tb, 2 * params.N), lambda b: (b, 0)),
            pl.BlockSpec((tb, 1), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 2 * params.N), lambda b: (b, 0)),
        scratch_shapes=[pltpu.VMEM((2, rows, width), I8),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * 2 * (2 * params.l) * K * 9 * ns * ns,
            bytes_accessed=B_ * 2 * params.N * 4 * 2 + 2 * rows * width,
            transcendentals=0),
        compiler_params=_COMPILER_PARAMS,
    )(panels, acc_flat, a_tilde.astype(I32).reshape(B_, 1))


def chain(name, fn, x0):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, STEPS, lambda i, s: fn(s), a)

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
    acc = jnp.asarray(
        rs.randint(0, 2**32, size=(256, 2, P.N), dtype=np.uint64).astype(np.uint32))
    ai = jnp.asarray(rs.randint(0, 2 * P.N, size=(256,)).astype(np.int32))

    m = get_engine("matmul")
    rot = rpoly.rotate_binary(acc, ai[:, None])
    diff = (rot - acc).astype(U32)
    want = (acc + m.external_product_digits(
        m.prepare_trgsw(rows, P), rtrgsw.decompose_trlwe(diff, P), P)).astype(U32)

    k2 = PallasKaratsubaEngine(levels=2)
    prep2 = k2.prepare_trgsw(rows, P)
    panels2 = jax.block_until_ready(build_panels_doubling(prep2, P.N >> 2, 128))
    flat = k2.scan_enter(acc, P)
    for tag, pipe in [("leafJIT", False), ("pipelined", True)]:
        got = k2.scan_exit(step_coissue(flat, ai, panels2, params=P, pipelined=pipe), P)
        ok = np.array_equal(np.asarray(got), np.asarray(want))
        print(f"exact[{tag}]: {ok}", flush=True)
        if not ok:
            return

    acc0 = jnp.asarray(
        rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))
    flat0 = jax.block_until_ready(k2.scan_enter(acc0, P))

    chain("A: baseline (upfront planes, prebuilt)",
          lambda a: step_var(a, a_t, panels2, params=P), flat0)
    chain("B: per-leaf JIT build (prebuilt)",
          lambda a: step_coissue(a, a_t, panels2, params=P, pipelined=False), flat0)
    chain("C: software-pipelined (prebuilt)",
          lambda a: step_coissue(a, a_t, panels2, params=P, pipelined=True), flat0)


if __name__ == "__main__":
    main()
