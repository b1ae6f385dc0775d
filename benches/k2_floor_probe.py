"""Per-component floor attribution of the production pallas_k2 step
(VERDICT r3 item 5: close the last ~1.3x single-chip gap or upgrade
ROADMAP item 4 from stall note to closed proof).

The production fused CMux step measures ~2.1 ms at B=8192 (prebuilt
panels) against a 1.18 ms MXU speed-of-light.  This probe times ABLATED
variants of the real kernel — each variant removes exactly one component
while keeping every remaining data dependency — so the difference
full - variant attributes that component's wall share, to be compared
against its analytic VPU/HBM floor:

  full       the production step (baseline)
  norot      rotation stages skipped (rot := acc)
  noextract  digit extraction collapsed to one shared shift per plane
  notree     Karatsuba operand tree skipped (every T plane := residue 0)
  nodots     MXU dots replaced by a broadcast add of the operand plane
  norecomb   limb recombination dropped (limb-0 contribution only)
  nocombine  tree_combine replaced by leaf pass-through
  accio      pure accumulator round trip (read, add, write)

Timing: STEPS chained iterations inside ONE jit (the relay caches
identical executions and a dispatch costs ~5 ms, so per-call timing is
meaningless — see step_breakdown_probe.py).

Usage: RUSTFHE_ENGINE=pallas_k2 [PRESET=pbs] python benches/k2_floor_probe.py [B] [which...]

PRESET=pbs runs the same ablation at params.PBS_PARAMS (N=2048, l=4,
n=714) — the VERDICT r4 #4 ceiling attribution for the PBS-preset kernel
(where the analytic MAC count is 5.3x the default set's while the
VPU/VMEM mass only ~2x: the step should flip from VPU-bound to
MXU-bound; this probe measures which).
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rustfhe_tpu.engine.pallas_k import (  # noqa: E402
    _COMPILER_PARAMS,
    _rotate_res_inkernel,
    tree_combine,
    tree_planes,
    _shiftz1_u32,
    PallasKaratsubaEngine,
    TM,
)
from rustfhe_tpu import keys, trgsw  # noqa: E402
from rustfhe_tpu.engine import get_engine  # noqa: E402
from rustfhe_tpu.params import DEFAULT_PARAMS, PBS_PARAMS  # noqa: E402

P = PBS_PARAMS if os.environ.get("PRESET") == "pbs" else DEFAULT_PARAMS
from rustfhe_tpu.utils.rng import binary_array  # noqa: E402

I8, I32, U32 = jnp.int8, jnp.int32, jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
WHICH = set(sys.argv[2:]) or {
    "full", "norot", "noextract", "notree", "nodots", "norecomb",
    "nocombine", "accio",
}
STEPS = 16
LEVELS = 2
TB = 128


def _kernel_ablate(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params,
                   levels, num_limbs, limb_bits, tb, tm, ablate):
    b = pl.program_id(0)
    R = 1 << levels
    T = 3 ** levels
    ns = params.N // R
    lvls = params.l
    mask = U32(params.decomp_mask)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    acc = acc_ref[:, :]
    if ablate == "accio":
        o_ref[:, :] = acc + U32(1)
        return
    n_col = n_ref[:, 0:1]
    if ablate == "norot":
        rot = acc + n_col.astype(U32)  # keep the n dependency
    else:
        rot = _rotate_res_inkernel(acc, n_col, ns, levels)
    diff = (rot - acc).astype(U32)
    u = (diff + mask) ^ mask
    ui = jax.lax.bitcast_convert_type(u, I32)
    dig_planes = []
    if ablate == "noextract":
        shared = ui >> I32(32 - params.bgbit)
        dig_planes = [shared] * lvls
    else:
        for lv in range(lvls):
            dig_planes.append(
                (ui << I32(params.bgbit * lv)) >> I32(32 - params.bgbit))
    dj = []
    for p in (0, 1):
        base = R * p * ns
        for lv in range(lvls):
            d = dig_planes[lv]
            res = [d[:, base + i * ns : base + (i + 1) * ns] for i in range(R)]
            if ablate == "notree":
                planes = [res[0]] * T
            else:
                planes = tree_planes(res, lambda a, b: a + b)
            dj.append([x.astype(I8) for x in planes])

    new_segs = []
    for c in (0, 1):
        leaves = []
        for t in range(T):
            leaf = None
            limbs = 1 if ablate == "norecomb" else num_limbs
            for l in range(limbs):
                part = jnp.zeros((tb, ns), I32)
                for j in range(2 * lvls):
                    r0 = ((j * num_limbs + l) * T + t) * tm
                    for mb in range(ns // tm):
                        d_blk = dj[j][t][:, mb * tm : (mb + 1) * tm]
                        col0 = (ns - tm) - mb * tm
                        w_blk = w_vmem[c, r0 : r0 + tm, col0 : col0 + ns]
                        if ablate == "nodots":
                            part += d_blk.astype(I32)[:, 0:1] + w_blk.astype(
                                I32)[0:1, :]
                        else:
                            part += jnp.dot(d_blk, w_blk,
                                            preferred_element_type=I32)
                contrib = part.astype(U32) if l == 0 else (
                    part.astype(U32) << U32(limb_bits * l))
                leaf = contrib if leaf is None else leaf + contrib
            leaves.append(leaf)
        if ablate == "nocombine":
            outs = leaves[:R]
        else:
            outs = tree_combine(leaves, lambda v: _shiftz1_u32(v, ns))
        for i in range(R):
            seg = slice((R * c + i) * ns, (R * c + i + 1) * ns)
            new_segs.append(acc[:, seg] + outs[i])
    for gi in range(2 * R):
        o_ref[:, gi * ns : (gi + 1) * ns] = new_segs[gi]


def make_step(panels, a_tilde, ablate):
    T = 3 ** LEVELS
    ns = P.N >> LEVELS
    eng = get_engine("pallas_k2")
    rows = 2 * P.l * eng.num_limbs * T * TM
    width = 2 * ns - TM

    def step(acc):
        return pl.pallas_call(
            functools.partial(
                _kernel_ablate, params=P, levels=LEVELS,
                num_limbs=eng.num_limbs, limb_bits=eng.limb_bits, tb=TB,
                tm=TM, ablate=ablate),
            out_shape=jax.ShapeDtypeStruct((B, 2 * P.N), U32),
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((TB, 2 * P.N), lambda b: (b, 0)),
                pl.BlockSpec((TB, 1), lambda b: (b, 0)),
            ],
            out_specs=pl.BlockSpec((TB, 2 * P.N), lambda b: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, rows, width), I8),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=_COMPILER_PARAMS,
        )(panels, acc, a_tilde)

    return step


def chain(name, step_fn, x0):
    """SLOPE over readback-forced runs of the STEPS-step jitted loop
    (BENCH.md round-4 methodology: block_until_ready alone is not a
    completion barrier through the relay)."""

    @jax.jit
    def run(a):
        def body(i, a):
            return step_fn(a)
        return jax.lax.fori_loop(0, STEPS, body, a)

    out = run(x0)
    _ = np.asarray(out[:1, :4])  # compile + settle
    times = {}
    for k in (1, 4):
        y = run(x0)
        _ = np.asarray(y[:1, :4])
        t0 = time.perf_counter()
        for _i in range(k):
            y = run(y)
        _ = np.asarray(y[:1, :4])
        times[k] = time.perf_counter() - t0
    dt = (times[4] - times[1]) / (3 * STEPS)
    print(f"{name}: {dt * 1e3:.3f} ms/step", flush=True)
    return dt


def main():
    print(f"# device: {jax.devices()[0].platform}, B={B}, {STEPS} steps/jit, "
          f"N={P.N} l={P.l} n={P.n}", flush=True)
    eng = get_engine("pallas_k2")
    key = jax.random.PRNGKey(0)
    s1 = binary_array(jax.random.fold_in(key, 1), (P.N,))
    rows = trgsw.encrypt_int(jax.random.fold_in(key, 2), s1,
                             jnp.ones((1,), I32), P, eng)
    prep = eng.prepare_trgsw(rows, P)
    panels = eng.prepare_panels(prep, P)[0]  # (2, rows, width) int8
    a_tilde = jax.random.randint(jax.random.fold_in(key, 3), (B, 1), 0,
                                 2 * P.N, I32)
    acc0 = jax.random.bits(jax.random.fold_in(key, 4), (B, 2 * P.N), U32)

    results = {}
    order = ["full", "norot", "noextract", "notree", "nodots", "norecomb",
             "nocombine", "accio"]
    for name in order:
        if name not in WHICH:
            continue
        try:
            results[name] = chain(name, make_step(panels, a_tilde, name), acc0)
        except Exception as e:  # noqa: BLE001 — probe records failures
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
    if "full" in results:
        f = results["full"]
        print("\n# component attribution (full - variant):")
        for name in order[1:]:
            if name in results:
                print(f"#   {name:10s}: {1e3 * (f - results[name]):+.3f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
