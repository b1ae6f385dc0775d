"""Probe: two-level Karatsuba (Z = X^4, nine quarter-size negacyclic convs,
0.5625x MACs) fused CMux step vs the production level-1 kernel.

Exactness is checked on device against the composed XLA matmul path before
timing.  Usage: python benches/karatsuba2_probe.py [B]
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
    _neg_u32,
    _roll_y_static_seg,
    fused_cmux_step_k,
)
from rustfhe_tpu.engine.pallas_step import (  # noqa: E402
    _COMPILER_PARAMS,
    build_panels_doubling,
)
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402
from rustfhe_tpu.poly import to_signed_limbs  # noqa: E402

I8, I32, U32 = jnp.int8, jnp.int32, jnp.uint32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = 16
MACS_FULL = 2 * P.l * P.N * 2 * 4 * P.N
K = 4  # limbs


# --------------------------------------------------------------------- #
# Layout: segments [p0r0 p0r1 p0r2 p0r3 p1r0 ... p1r3], each nq = N/4.
# --------------------------------------------------------------------- #
def enter4(acc, N):
    nq = N // 4
    x = jnp.moveaxis(acc.reshape(acc.shape[:-1] + (nq, 4)), -1, -2)
    return x.reshape(acc.shape[:-2] + (2 * N,))


def exit4(flat, N):
    nq = N // 4
    x = flat.reshape(flat.shape[:-1] + (2, 4, nq))
    return jnp.moveaxis(x, -2, -1).reshape(flat.shape[:-1] + (2, N))


def prepare_k2(rows, params):
    """rows u32 (2L, 2, N) -> int8 (2, 2L*K*9, 2*nq), group g=(j*K+l)*9+h*3+u."""
    rows = jnp.asarray(rows, U32)
    nq = params.N // 4
    r = [rows[..., i::4] for i in range(4)]  # residues, each (2L, 2, nq)
    trips = [
        (r[0], r[2], (r[0] + r[2]).astype(U32)),                      # h=0: qe
        (r[1], r[3], (r[1] + r[3]).astype(U32)),                      # h=1: qo
        ((r[0] + r[1]).astype(U32), (r[2] + r[3]).astype(U32),
         (r[0] + r[1] + r[2] + r[3]).astype(U32)),                    # h=2: qs
    ]
    q = jnp.stack([t for trip in trips for t in trip], axis=-2)  # (2L,2,9,nq)
    neg = (~q + U32(1)).astype(U32)
    limbs = jnp.moveaxis(to_signed_limbs(q, 8, K), -1, -2)       # (2L,2,9,K,nq)
    nlimbs = jnp.moveaxis(to_signed_limbs(neg, 8, K), -1, -2)
    dbl = jnp.concatenate([limbs, nlimbs], axis=-1)              # (2L,2,9,K,2nq)
    dbl = jnp.transpose(dbl, (1, 0, 3, 2, 4))                    # (2,2L,K,9,2nq)
    return dbl.reshape(2, 2 * params.l * K * 9, 2 * nq)


def _mul_x4(x, nq):
    parts = []
    for p in range(2):
        r = [x[:, (4 * p + i) * nq : (4 * p + i + 1) * nq] for i in range(4)]
        z3 = jnp.concatenate([_neg_u32(r[3][:, nq - 1 :]), r[3][:, : nq - 1]], axis=1)
        parts += [z3, r[0], r[1], r[2]]
    return jnp.concatenate(parts, axis=1)


def _mul_x2_4(x, nq):
    parts = []
    for p in range(2):
        r = [x[:, (4 * p + i) * nq : (4 * p + i + 1) * nq] for i in range(4)]
        z2 = jnp.concatenate([_neg_u32(r[2][:, nq - 1 :]), r[2][:, : nq - 1]], axis=1)
        z3 = jnp.concatenate([_neg_u32(r[3][:, nq - 1 :]), r[3][:, : nq - 1]], axis=1)
        parts += [z2, z3, r[0], r[1]]
    return jnp.concatenate(parts, axis=1)


def _rotate4(x, n_col, nq):
    out = jnp.where((n_col & 1) == 1, _mul_x4(x, nq), x)
    out = jnp.where(((n_col >> 1) & 1) == 1, _mul_x2_4(out, nq), out)
    t_bits = (2 * nq - 1).bit_length()
    for k in range(t_bits):
        bit = ((n_col >> (k + 2)) & 1) == 1
        out = jnp.where(bit, _roll_y_static_seg(out, 1 << k, nq, 8), out)
    return out


def _shiftz1_i32(m, nq):
    return jnp.concatenate([-m[:, nq - 1 :], m[:, : nq - 1]], axis=1)


def kernel_k2(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params, tb, tm):
    b = pl.program_id(0)
    nq = params.N // 4
    lvls = params.l
    mask, half, dmask = U32(params.decomp_mask), U32(params.half_bg), U32(params.bg - 1)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    n_col = n_ref[:, 0:1]
    acc = acc_ref[:, :]
    rot = _rotate4(acc, n_col, nq)
    u = ((rot - acc).astype(U32) + mask) ^ mask

    dj = []  # per j: 9 int8 quarter planes ordered h*3+u
    for p in (0, 1):
        base = 4 * p * nq
        for lv in range(lvls):
            shift = U32(32 - params.bgbit * (lv + 1))
            raw = (u >> shift) & dmask
            dig = (raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32)
            d = [dig[:, base + i * nq : base + (i + 1) * nq] for i in range(4)]
            planes = [
                d[0], d[2], d[0] + d[2],
                d[1], d[3], d[1] + d[3],
                d[0] + d[1], d[2] + d[3], d[0] + d[1] + d[2] + d[3],
            ]
            dj.append([x.astype(I8) for x in planes])

    for c in (0, 1):
        outs = [jnp.zeros((tb, nq), U32) for _ in range(4)]  # r0 r1 r2 r3
        for l in range(K):
            m = [jnp.zeros((tb, nq), I32) for _ in range(9)]
            for j in range(2 * lvls):
                for t in range(9):
                    r0 = ((j * K + l) * 9 + t) * tm
                    for mb in range(nq // tm):
                        d_blk = dj[j][t][:, mb * tm : (mb + 1) * tm]
                        col0 = (nq - tm) - mb * tm
                        w_blk = w_vmem[c, r0 : r0 + tm, col0 : col0 + nq]
                        m[t] += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
            eh, oh = [], []
            for h in range(3):
                m0, m1, m2 = m[3 * h], m[3 * h + 1], m[3 * h + 2]
                eh.append(m0 + _shiftz1_i32(m1, nq))
                oh.append(m2 - m0 - m1)
            res = [
                eh[0] + _shiftz1_i32(oh[1], nq),  # r0: even of result_e
                eh[2] - eh[0] - eh[1],            # r1: even of result_o
                oh[0] + eh[1],                    # r2: odd of result_e
                oh[2] - oh[0] - oh[1],            # r3: odd of result_o
            ]
            sh = U32(8 * l)
            for i in range(4):
                outs[i] = outs[i] + (res[i].astype(U32) << sh)
        for i in range(4):
            seg = slice((4 * c + i) * nq, (4 * c + i + 1) * nq)
            o_ref[:, seg] = acc_ref[:, seg] + outs[i]


@functools.partial(jax.jit, static_argnames=("params", "tb", "tm"))
def step_k2(acc_flat, a_tilde, panels, *, params, tb=128, tm=128):
    B_ = acc_flat.shape[0]
    nq = params.N // 4
    rows = 2 * params.l * K * 9 * tm
    width = 2 * nq - tm
    return pl.pallas_call(
        functools.partial(kernel_k2, params=params, tb=tb, tm=tm),
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
            flops=2 * B_ * 2 * (2 * params.l) * K * 9 * nq * nq,
            bytes_accessed=B_ * 2 * params.N * 4 * 2 + 2 * rows * width,
            transcendentals=0),
        compiler_params=_COMPILER_PARAMS,
    )(panels, acc_flat, a_tilde.astype(I32).reshape(B_, 1))


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

    prep2 = prepare_k2(rows, P)
    panels2 = jax.block_until_ready(build_panels_doubling(prep2, P.N // 4, 128))
    got = exit4(step_k2(enter4(acc, P.N), ai, panels2, params=P), P.N)
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"karatsuba2 step exact on device: {ok}", flush=True)
    if not ok:
        bad = np.argwhere(np.asarray(got) != np.asarray(want))
        print(f"  mismatches: {len(bad)} first={bad[:3]}", flush=True)
        return

    acc0 = jnp.asarray(
        rs.randint(0, 2**32, size=(B, 2, P.N), dtype=np.uint64).astype(np.uint32))
    a_t = jnp.asarray(rs.randint(0, 2 * P.N, size=(B,)).astype(np.int32))
    n2 = a_t.astype(I32)

    ke = PallasKaratsubaEngine(tb=128)
    prep1 = ke.prepare_trgsw(rows, P)
    panels1 = jax.block_until_ready(build_panels_doubling(prep1, P.N // 2, 128))
    flat1 = jax.block_until_ready(ke.scan_enter(acc0, P))
    flat2 = jax.block_until_ready(enter4(acc0, P.N))

    chain("karatsuba1 (prebuilt, prod)",
          lambda a: fused_cmux_step_k(a, n2, panels1, params=P, tb=128), flat1)
    chain("karatsuba2 tm=128 (prebuilt)",
          lambda a: step_k2(a, n2, panels2, params=P, tb=128, tm=128), flat2)
    panels2w = jax.block_until_ready(build_panels_doubling(prep2, P.N // 4, 256))
    chain("karatsuba2 tm=256 (prebuilt)",
          lambda a: step_k2(a, n2, panels2w, params=P, tb=128, tm=256), flat2)

    def step_fastbuild_k2(a):
        z = jnp.minimum(a[0, 0], U32(0)).astype(I8)
        pw = build_panels_doubling(prep2 + z, P.N // 4, 128)
        return step_k2(a, n2, pw, params=P, tb=128, tm=128)

    chain("karatsuba2 + fastbuild", step_fastbuild_k2, flat2)


if __name__ == "__main__":
    main()
