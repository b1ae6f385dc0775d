"""Breakdown probe for the fused CMux-step kernel (engine/pallas_step.py).

Isolates where the step time goes (the full kernel runs at ~58% of the
394 TOPS int8 peak) by timing variants of the real kernel:

  full        the production fused_cmux_step (tb 128/256/512)
  nodots      rotation + decompose + recombine, MXU dots replaced by a
              broadcast add (keeps all data deps)
  norot       dots + decompose + recombine, rotation skipped
  tm256       full kernel with 256-deep contraction panels (int8 MXU packs
              two 128-deep passes per cell; K=128 dots may run at half peak)

plus a pure static-sliced dot sweep at the step's contraction size
(6144) for tm in {128, 256, 512} and a single unsliced K=6144 dot.

Timing methodology: STEPS iterations inside ONE jit via fori_loop — a
single dispatch through the axon relay costs ~5 ms, which poisons
per-call chain timing (measured 2026-08-18: the same kernel reads
8.5 ms/call dispatched vs 3.6 ms/step inside the production scan).

Usage: python benches/step_breakdown_probe.py [B] [which ...]
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
    _rotate_binary_inkernel,
    build_panels,
    fused_cmux_step,
    fused_cmux_step_merged,
)
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402

I8, I32, U32 = jnp.int8, jnp.int32, jnp.uint32

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
WHICH = set(sys.argv[2:]) or {"full", "nodots", "norot", "tm256", "dots"}
MACS_PER_GATE_STEP = 2 * P.l * P.N * 2 * 4 * P.N  # 50.3M
STEPS = 16  # scan length inside one jit (amortizes ~5ms dispatch)

# The default "scoped vmem" stack limit is 16MB, below the v5e's physical
# VMEM (128MB); raise it so bigger tiles compile.
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def chain(name, step_fn, x0, macs_per_iter):
    """step_fn: acc -> acc.  Times STEPS applications inside one jit."""

    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, STEPS, lambda i, s: step_fn(s), a)

    try:
        jax.block_until_ready(run(x0))  # compile
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:150]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(3):
        x0 = run(x0)
    jax.block_until_ready(x0)
    dt = (time.perf_counter() - t0) / (3 * STEPS)
    tops = 2 * macs_per_iter / dt / 1e12
    print(f"{name:28s} {dt*1e3:9.3f} ms/step   {tops:6.1f} TOPS-equiv",
          flush=True)
    return dt


def variant_kernel(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, tb, tm,
                   do_rotate, do_dots):
    c, b = pl.program_id(0), pl.program_id(1)
    N = P.N
    lvls = P.l
    mask = U32(P.decomp_mask)
    half = U32(P.half_bg)
    digit_mask = U32(P.bg - 1)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm.at[c], w_vmem, sem)
        cp.start()
        cp.wait()

    n_col = n_ref[:, 0:1]
    accs = [acc_ref[:, p, :] for p in (0, 1)]
    us = []
    for p in (0, 1):
        if do_rotate:
            rot = _rotate_binary_inkernel(accs[p], n_col, N)
            diff = (rot - accs[p]).astype(U32)
        else:
            diff = accs[p]
        us.append((diff + mask) ^ mask)

    acc_out = jnp.zeros((tb, N), U32)
    for j in range(2 * lvls):
        u = us[j // lvls]
        shift = U32(32 - P.bgbit * ((j % lvls) + 1))
        raw = (u >> shift) & digit_mask
        dig = (raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32).astype(I8)
        for l in range(4):
            r0 = (j * 4 + l) * tm
            part = jnp.zeros((tb, N), I32)
            for mb in range(N // tm):
                d_blk = dig[:, mb * tm : (mb + 1) * tm]
                col0 = (N - tm) - mb * tm
                w_blk = w_vmem[r0 : r0 + tm, col0 : col0 + N]
                if do_dots:
                    part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
                else:
                    part += d_blk[:, :1].astype(I32)  # keep deps, no MXU
            acc_out = acc_out + (part.astype(U32) << U32(8 * l))
    old = jnp.where(c == 0, accs[0], accs[1])
    o_ref[:] = old + acc_out


def make_variant(panels, a_tilde, tb, tm, do_rotate, do_dots):
    rows = 2 * P.l * 4 * tm
    width = 2 * P.N - tm
    n2 = a_tilde.astype(I32).reshape(B, 1)

    def step(acc):
        out = pl.pallas_call(
            functools.partial(variant_kernel, tb=tb, tm=tm,
                              do_rotate=do_rotate, do_dots=do_dots),
            out_shape=jax.ShapeDtypeStruct((B, 2 * P.N), U32),
            grid=(2, B // tb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tb, 2, P.N), lambda c, b: (b, 0, 0)),
                pl.BlockSpec((tb, 1), lambda c, b: (b, 0)),
            ],
            out_specs=pl.BlockSpec((tb, P.N), lambda c, b: (b, c)),
            scratch_shapes=[pltpu.VMEM((rows, width), I8),
                            pltpu.SemaphoreType.DMA(())],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * MACS_PER_GATE_STEP,
                bytes_accessed=B * 2 * P.N * 4 * 2 + 2 * rows * width,
                transcendentals=0),
            compiler_params=CP,
        )(panels, acc, n2)
        return out.reshape(B, 2, P.N)

    return step


def dot_kernel(d_ref, w_ref, o_ref, *, tb, tm, groups):
    if tm == 0:  # single unsliced dot
        acc = jnp.dot(d_ref[:], w_ref[:], preferred_element_type=I32)
    else:
        acc = jnp.zeros((tb, P.N), I32)
        for g in range(groups):
            acc += jnp.dot(d_ref[:, g * tm : (g + 1) * tm],
                           w_ref[g * tm : (g + 1) * tm, :],
                           preferred_element_type=I32)
    o_ref[:] = acc


def make_dot(w, tb, tm):
    K = w.shape[0]
    groups = K // tm if tm else 0

    def f(d):
        return pl.pallas_call(
            functools.partial(dot_kernel, tb=tb, tm=tm, groups=groups),
            out_shape=jax.ShapeDtypeStruct((B, P.N), I32),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, K), lambda b: (b, 0)),
                pl.BlockSpec((K, P.N), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, P.N), lambda b: (b, 0)),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * K * P.N,
                bytes_accessed=B * K + K * P.N + B * P.N * 4,
                transcendentals=0),
            compiler_params=CP,
        )(d, w)

    return f


def main():
    rs = np.random.RandomState(0)
    print(f"# device: {jax.devices()[0]}  B={B}  steps/jit={STEPS}",
          flush=True)

    acc0 = jnp.asarray(rs.randint(0, 2**32, size=(B, 2, P.N),
                                  dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))
    qd = jnp.asarray(rs.randint(-128, 128, size=(2, 2 * P.l * 4, 2 * P.N)
                                ).astype(np.int8))

    if "full" in WHICH:
        panels = jax.block_until_ready(build_panels(qd, P, 128))
        chain("full (prod, tb=128)",
              lambda a: fused_cmux_step(a, a_t, panels, params=P, tb=128),
              acc0, B * MACS_PER_GATE_STEP)
        for tb in (256, 512):
            chain(f"full (tb={tb})",
                  make_variant(panels, a_t, tb, 128, True, True),
                  acc0, B * MACS_PER_GATE_STEP)
    if "merged" in WHICH or "full" in WHICH:
        panels = jax.block_until_ready(build_panels(qd, P, 128))
        for tb in (128, 256, 512):
            chain(f"merged (tb={tb})",
                  lambda a, tb=tb: fused_cmux_step_merged(
                      a, a_t, panels, params=P, tb=tb),
                  acc0, B * MACS_PER_GATE_STEP)
    if "nodots" in WHICH:
        panels = jax.block_until_ready(build_panels(qd, P, 128))
        chain("nodots (tb=128)",
              make_variant(panels, a_t, 128, 128, True, False),
              acc0, B * MACS_PER_GATE_STEP)
    if "norot" in WHICH:
        panels = jax.block_until_ready(build_panels(qd, P, 128))
        chain("norot (tb=128)",
              make_variant(panels, a_t, 128, 128, False, True),
              acc0, B * MACS_PER_GATE_STEP)
    if "tm256" in WHICH:
        panels = jax.block_until_ready(build_panels(qd, P, 256))
        for tb in (256, 128):
            chain(f"tm256 (tb={tb})",
                  make_variant(panels, a_t, tb, 256, True, True),
                  acc0, B * MACS_PER_GATE_STEP)

    if "wide" in WHICH:
        # tm=1024: one K=1024 dot per (j,l) — MXU-internal accumulation,
        # no VPU partial-sum adds.  Panels are 24MB/c (48MB merged).
        panels_w = jax.block_until_ready(build_panels(qd, P, 1024))
        for tb in (128, 256):
            chain(f"wide merged tm=1024 tb={tb}",
                  lambda a, tb=tb: fused_cmux_step_merged(
                      a, a_t, panels_w, params=P, tb=tb, tm=1024),
                  acc0, B * MACS_PER_GATE_STEP)
        chain("wide csplit tm=1024 tb=128",
              lambda a: fused_cmux_step(
                  a, a_t, panels_w, params=P, tb=128, tm=1024),
              acc0, B * MACS_PER_GATE_STEP)

        # Realistic per-step cost incl. the XLA panel build (the scan
        # rebuilds panels from bk[i] each step).  A data-dependent zero
        # stops XLA hoisting the build out of the timing loop.
        def step_build_wide(a):
            z = jnp.minimum(a[0, 0, 0], U32(0)).astype(I8)
            pw = build_panels(qd + z, P, 1024)
            return fused_cmux_step_merged(a, a_t, pw, params=P,
                                          tb=128, tm=1024)

        chain("wide merged + XLA build", step_build_wide, acc0,
              B * MACS_PER_GATE_STEP)

        def step_build_128(a):
            z = jnp.minimum(a[0, 0, 0], U32(0)).astype(I8)
            pw = build_panels(qd + z, P, 128)
            return fused_cmux_step_merged(a, a_t, pw, params=P,
                                          tb=128, tm=128)

        chain("tm=128 merged + XLA build", step_build_128, acc0,
              B * MACS_PER_GATE_STEP)

    if "fastbuild" in WHICH:
        from rustfhe_tpu.engine.pallas_step import build_panels_fast

        def step_fastbuild(a):
            z = jnp.minimum(a[0, 0, 0], U32(0)).astype(I8)
            pw = build_panels_fast(qd + z, P, 128)
            return fused_cmux_step_merged(a, a_t, pw, params=P,
                                          tb=128, tm=128)

        chain("merged + fast build", step_fastbuild, acc0,
              B * MACS_PER_GATE_STEP)

    if "dots" in WHICH:
        K = 6144
        w = jnp.asarray(rs.randint(-128, 128, size=(K, P.N)).astype(np.int8))
        d0 = jnp.asarray(rs.randint(-32, 32, size=(B, K)).astype(np.int8))

        for tb, tm in [(256, 128), (256, 256), (256, 512), (512, 256),
                       (256, 0), (512, 0)]:
            f = make_dot(w, tb, tm)

            def step(d, f=f):
                y = f(d)  # (B, N) i32
                fb = ((y[:, :1] & 1).astype(I8) + d0)  # (B, K) data-dep
                return fb.astype(I8)

            chain(f"dot tb={tb} tm={tm or 'full'}", step, d0, B * K * P.N)


if __name__ == "__main__":
    main()
