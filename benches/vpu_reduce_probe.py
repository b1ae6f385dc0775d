"""Probe: VPU-work reduction variants of the fused Karatsuba CMux step.

The step kernel is VPU-bound (BENCH.md: nodots 1.85 ms vs full 2.07-2.32),
so this probe A/Bs VPU-side restructurings at fixed MXU work:

  a) combine order: leaf-first u32 limb recombination + ONE tree_combine
     (new production form) vs the old limb-outer form (tree_combine x K).
  b) int16 tree_planes: digit-plane sums in int16 (2 elems/lane) vs int32.
  c) digit extract via shift-sub instead of u32 multiply.
  d) 2-step in-kernel unroll: halves the acc HBM roundtrip per step.

Exactness is asserted on device vs the XLA matmul path before timing.
Usage: python benches/vpu_reduce_probe.py [B]
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

from rustfhe_tpu import poly as rpoly, trgsw as rtrgsw  # noqa: E402
from rustfhe_tpu.engine import get_engine  # noqa: E402
from rustfhe_tpu.engine.pallas_k import (  # noqa: E402
    PallasKaratsubaEngine,
    _rotate_res_inkernel,
    _shiftz1_i32,
    _shiftz1_u32,
    fused_cmux_step_k,
    tree_combine,
    tree_planes,
)
from rustfhe_tpu.engine.pallas_step import (  # noqa: E402
    _COMPILER_PARAMS,
    build_panels_doubling,
)
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402

I8, I16, I32, U32 = jnp.int8, jnp.int16, jnp.int32, jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = 16
MACS_FULL = 2 * P.l * P.N * 2 * 4 * P.N
K = 4


# --------------------------------------------------------------------- #
# Parametrized kernel
# --------------------------------------------------------------------- #
def _digits_and_tree(acc, n_col, params, *, levels, planes16, extract_shift,
                     extract_sar=False, skip_rotate=False):
    R = 1 << levels
    ns = params.N // R
    lvls = params.l
    mask = U32(params.decomp_mask)
    half = U32(params.half_bg)
    digit_mask = U32(params.bg - 1)

    if skip_rotate:  # attribution only (inexact): charge zero rotate stages
        rot = (acc + U32(1)).astype(U32)
    else:
        rot = _rotate_res_inkernel(acc, n_col, ns, levels)
    diff = (rot - acc).astype(U32)
    u = (diff + mask) ^ mask

    sum_dtype = I16 if planes16 else I32
    dig_planes = []
    for lv in range(lvls):
        if extract_sar:
            # One-pass sign-extended extract: shl puts the digit window at
            # the top, arithmetic shr brings it back — 2 static shifts/level
            # instead of shift+and+and+mul+add (the balanced digit
            # raw - (raw & half)*2 IS the bgbit-bit sign extension of the
            # window).
            ui = jax.lax.bitcast_convert_type(u, I32)
            d = (ui << I32(params.bgbit * lv)) >> I32(32 - params.bgbit)
            dig_planes.append(d.astype(sum_dtype))
            continue
        shift = U32(32 - params.bgbit * (lv + 1))
        raw = (u >> shift) & digit_mask
        if extract_shift:
            d = (raw - ((raw & half) << U32(1))).astype(I32)
        else:
            d = (raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32)
        dig_planes.append(d.astype(sum_dtype))
    dj = []
    for p in (0, 1):
        base = R * p * ns
        for lv in range(lvls):
            d = dig_planes[lv]
            res = [d[:, base + i * ns : base + (i + 1) * ns] for i in range(R)]
            planes = tree_planes(res, lambda a, b: a + b)
            dj.append([x.astype(I8) for x in planes])
    return dj


def _accumulate(dj, w_vmem, c, *, ns, lvls, T, tm, tb, leaf_combine):
    if leaf_combine:
        leaves = []
        for t in range(T):
            leaf = None
            for l in range(K):
                part = jnp.zeros((tb, ns), I32)
                for j in range(2 * lvls):
                    r0 = ((j * K + l) * T + t) * tm
                    for mb in range(ns // tm):
                        d_blk = dj[j][t][:, mb * tm : (mb + 1) * tm]
                        col0 = (ns - tm) - mb * tm
                        w_blk = w_vmem[c, r0 : r0 + tm, col0 : col0 + ns]
                        part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
                contrib = part.astype(U32) if l == 0 else (part.astype(U32) << U32(8 * l))
                leaf = contrib if leaf is None else leaf + contrib
            leaves.append(leaf)
        return tree_combine(leaves, lambda v: _shiftz1_u32(v, ns))
    outs = None
    for l in range(K):
        m = [jnp.zeros((tb, ns), I32) for _ in range(T)]
        for j in range(2 * lvls):
            for t in range(T):
                r0 = ((j * K + l) * T + t) * tm
                for mb in range(ns // tm):
                    d_blk = dj[j][t][:, mb * tm : (mb + 1) * tm]
                    col0 = (ns - tm) - mb * tm
                    w_blk = w_vmem[c, r0 : r0 + tm, col0 : col0 + ns]
                    m[t] += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
        res = tree_combine(m, lambda v: _shiftz1_i32(v, ns))
        if outs is None:
            outs = [jnp.zeros((tb, ns), U32) for _ in range(len(res))]
        sh = U32(8 * l)
        for i in range(len(res)):
            outs[i] = outs[i] + (res[i].astype(U32) << sh)
    return outs


def _kernel_var(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params, levels,
                tb, tm, leaf_combine, planes16, extract_shift, unroll,
                extract_sar=False, skip_rotate=False):
    b = pl.program_id(0)
    R = 1 << levels
    T = 3 ** levels
    ns = params.N // R
    lvls = params.l

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    acc = acc_ref[:, :]
    for s in range(unroll):
        n_col = n_ref[:, s : s + 1]
        dj = _digits_and_tree(acc, n_col, params, levels=levels,
                              planes16=planes16, extract_shift=extract_shift,
                              extract_sar=extract_sar, skip_rotate=skip_rotate)
        new_segs = []
        for c in (0, 1):
            outs = _accumulate(dj, w_vmem.at[s] if unroll > 1 else w_vmem,
                               c, ns=ns, lvls=lvls, T=T, tm=tm, tb=tb,
                               leaf_combine=leaf_combine)
            for i in range(R):
                seg = slice((R * c + i) * ns, (R * c + i + 1) * ns)
                new_segs.append(acc[:, seg] + outs[i])
        acc = jnp.concatenate(new_segs, axis=1)
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=(
    "params", "levels", "tb", "tm", "leaf_combine", "planes16",
    "extract_shift", "unroll", "extract_sar", "skip_rotate"))
def step_var(acc_flat, a_tilde, panels, *, params, levels=2, tb=128, tm=128,
             leaf_combine=True, planes16=False, extract_shift=False, unroll=1,
             extract_sar=False, skip_rotate=False):
    B_ = acc_flat.shape[0]
    T = 3 ** levels
    ns = params.N >> levels
    rows = 2 * params.l * K * T * tm
    width = 2 * ns - tm
    if unroll > 1:
        assert panels.shape == (unroll, 2, rows, width), panels.shape
        scratch = pltpu.VMEM((unroll, 2, rows, width), I8)
    else:
        assert panels.shape == (2, rows, width), panels.shape
        scratch = pltpu.VMEM((2, rows, width), I8)
    return pl.pallas_call(
        functools.partial(
            _kernel_var, params=params, levels=levels, tb=tb, tm=tm,
            leaf_combine=leaf_combine, planes16=planes16,
            extract_shift=extract_shift, unroll=unroll,
            extract_sar=extract_sar, skip_rotate=skip_rotate),
        out_shape=jax.ShapeDtypeStruct((B_, 2 * params.N), U32),
        grid=(B_ // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tb, 2 * params.N), lambda b: (b, 0)),
            pl.BlockSpec((tb, unroll), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 2 * params.N), lambda b: (b, 0)),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * 2 * (2 * params.l) * K * T * ns * ns * unroll,
            bytes_accessed=B_ * 2 * params.N * 4 * 2 + 2 * rows * width * unroll,
            transcendentals=0),
        compiler_params=_COMPILER_PARAMS,
    )(panels, acc_flat, a_tilde.astype(I32).reshape(B_, unroll))


def chain(name, step_fn, x0):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, STEPS, lambda i, s: step_fn(s), a)

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
    print(f"{name:44s} {dt*1e3:9.3f} ms/step   "
          f"{2*B*MACS_FULL/dt/1e12:6.1f} TOPS-equiv(ref-MACs)", flush=True)


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

    # Exactness of each single-step variant on device (levels=2).
    k2 = PallasKaratsubaEngine(levels=2)
    prep2 = k2.prepare_trgsw(rows, P)
    panels2 = jax.block_until_ready(build_panels_doubling(prep2, P.N >> 2, 128))
    flat = k2.scan_enter(acc, P)
    for tag, kw in [
        ("leaf_u32", dict(leaf_combine=True)),
        ("limb_outer(old)", dict(leaf_combine=False)),
        ("leaf+int16", dict(leaf_combine=True, planes16=True)),
        ("leaf+shiftext", dict(leaf_combine=True, extract_shift=True)),
        ("leaf+sarext", dict(leaf_combine=True, extract_sar=True)),
    ]:
        got = k2.scan_exit(step_var(flat, ai, panels2, params=P, **kw), P)
        ok = np.array_equal(np.asarray(got), np.asarray(want))
        print(f"exact[{tag}]: {ok}", flush=True)
        if not ok:
            return

    # 2-step unroll exactness: apply the same step twice vs two kernel calls.
    ai2 = jnp.stack([ai, (ai * 7 + 3) % (2 * P.N)], axis=1)  # (256, 2)
    one = step_var(flat, ai, panels2, params=P)
    two_ref = step_var(one, ai2[:, 1], panels2, params=P)
    panels_u2 = jnp.stack([panels2, panels2])
    two_got = step_var(flat, ai2, panels_u2, params=P, unroll=2)
    print(f"exact[unroll2]: "
          f"{np.array_equal(np.asarray(two_got), np.asarray(two_ref))}", flush=True)

    # Timings at full batch, prebuilt panels (kernel-only comparison).
    acc0 = jnp.asarray(
        rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))
    a_t2 = jnp.stack([a_t, a_t], axis=1)
    flat0 = jax.block_until_ready(k2.scan_enter(acc0, P))

    chain("k2 limb_outer (old prod)",
          lambda a: step_var(a, a_t, panels2, params=P, leaf_combine=False), flat0)
    chain("k2 leaf_u32 (new prod)",
          lambda a: step_var(a, a_t, panels2, params=P), flat0)
    chain("k2 leaf_u32 + int16 planes",
          lambda a: step_var(a, a_t, panels2, params=P, planes16=True), flat0)
    chain("k2 leaf_u32 + shift extract",
          lambda a: step_var(a, a_t, panels2, params=P, extract_shift=True), flat0)
    chain("k2 leaf_u32 + int16 + shift",
          lambda a: step_var(a, a_t, panels2, params=P, planes16=True,
                             extract_shift=True), flat0)
    chain("k2 leaf_u32 + sar extract",
          lambda a: step_var(a, a_t, panels2, params=P, extract_sar=True), flat0)
    # Attribution (INEXACT, timing only): zero rotate stages in this
    # session's conditions — how much of the step is the 11-stage rotation?
    chain("k2 [attr] skip_rotate (inexact)",
          lambda a: step_var(a, a_t, panels2, params=P, skip_rotate=True), flat0)
    chain("k2 [attr] skip_rotate + sar (inexact)",
          lambda a: step_var(a, a_t, panels2, params=P, skip_rotate=True,
                             extract_sar=True), flat0)

    def unroll2(a):
        out = step_var(a, a_t2, panels_u2, params=P, unroll=2)
        return out

    @jax.jit
    def run_u2(a):
        return jax.lax.fori_loop(0, STEPS // 2, lambda i, s: unroll2(s), a)

    try:
        jax.block_until_ready(run_u2(flat0))
        t0 = time.perf_counter()
        y = flat0
        for _ in range(3):
            y = run_u2(y)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / (3 * STEPS)
        print(f"{'k2 leaf_u32 unroll2 (prebuilt)':44s} {dt*1e3:9.3f} ms/step",
              flush=True)
    except Exception as e:
        print(f"unroll2 FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

    # Production path (per-step panel build, level 1 + 2) for context.
    k1 = PallasKaratsubaEngine(levels=1)
    prep1 = k1.prepare_trgsw(rows, P)
    flat1 = jax.block_until_ready(k1.scan_enter(acc0, P))
    chain("k1 production cmux_step (fastbuild)",
          lambda a: k1.cmux_step(prep1, a, a_t, P), flat1)
    chain("k2 production cmux_step (fastbuild)",
          lambda a: k2.cmux_step(prep2, a, a_t, P), flat0)


if __name__ == "__main__":
    main()
