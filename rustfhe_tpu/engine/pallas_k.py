"""Karatsuba even/odd Pallas engine (TPU): 0.75x MXU MACs per split level.

Negacyclic degree-N convolution via recursive even/odd splitting (reference
hot loop: trgsw.rs:264-330 + tfhe.rs:103-110; this engine replaces the
spqlios f64 FFT with exact integer arithmetic like engine/pallas_step.py,
then cuts the MXU work by one or two Karatsuba levels):

  a(X) = ae(Y) + X ao(Y),  Y = X^2,  Y^(N/2) = -1  (half-size negacyclic)

  (a (*) q)_e = ae (*) qe + Y * (ao (*) qo)
  (a (*) q)_o = (ae+ao) (*) (qe+qo) - ae (*) qe - ao (*) qo

Applied recursively ``levels`` times: 3^levels convolutions of size
N / 2^levels — MACs x(3/4)^levels (levels=1: 0.75x, levels=2: 0.5625x).
All sums stay exact:

* digit side: |sum of 2^levels digits| <= (Bg/2) * 2^levels <= 128 -> int8
  (levels <= 2 at bgbit=6; asserted).
* key side: residue sums are computed mod 2^32 FIRST, then limb-split to
  int8 (the conv result is mod 2^32, so the wrapped sum recombines exactly).
* accumulators: |sum| <= 2L * ns * (Bg/2 * 2^levels) * 2^(limb_bits-1)
  ~= 2^24.6, exact in int32 with ample headroom for the (linear) Karatsuba
  recombination, which therefore commutes with the per-limb wrapping
  shift-add mod 2^32.

The blind-rotate accumulator lives in the residue ("e/o") layout for the
WHOLE scan — one (tb, 2N) lane plane with R = 2^levels segments of size
ns = N/R per poly half: [p0r0 .. p0r_{R-1} | p1r0 .. p1r_{R-1}] — so the
per-step VPU work (rotation, decomposition, digit extraction) runs once
over a single wide plane instead of per poly half:

* X^s rotation in residue layout: the low ``levels`` bits of s barrel-shift
  the residue lists (wrapped residues pick up one Z = X^R factor, a
  negacyclic shift-by-1 at leaf size); the remaining bits rotate all
  segments by Z^t at once — 11 select stages total for any level.
* One de-interleave at scan entry/exit only (engine.scan_enter/scan_exit).

Limb recombination is hoisted: digit-plane convolutions accumulate over all
2L planes in int32 first, then ONE wrapping shift-add per (c, limb, residue).

Measured (2026-08-18, benches/karatsuba_probe.py, karatsuba2_probe.py,
B=8192, prebuilt panels, same session): non-Karatsuba merged kernel
3.31 ms/step, levels=1 2.67, levels=2 2.38.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_step import TM, _COMPILER_PARAMS, build_panels_doubling

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32


# --------------------------------------------------------------------- #
# Karatsuba tree (shared by XLA-side key prep and in-kernel digit build)
# --------------------------------------------------------------------- #
def tree_planes(res, add):
    """res: list of 2^L residue planes -> list of 3^L combination planes.

    Recursion: planes(x) = planes(x_even) ++ planes(x_odd) ++
    planes(x_even + x_odd), matching the dot-group order used by the
    kernels (g = (j*K + l)*3^L + t)."""
    if len(res) == 1:
        return [res[0]]
    e, o = res[0::2], res[1::2]
    s = [add(a, b) for a, b in zip(e, o)]
    return tree_planes(e, add) + tree_planes(o, add) + tree_planes(s, add)


def tree_combine(ms, shiftz1):
    """ms: list of 3^L leaf conv results -> 2^L residue outputs.

    Inverse of tree_planes: result_e = E + Y*O, result_o = S - E - O,
    residues interleaved; multiply-by-Y on a residue list is a barrel
    shift whose wrapped element gets shiftz1 (negacyclic leaf shift)."""
    if len(ms) == 1:
        return [ms[0]]
    third = len(ms) // 3
    E = tree_combine(ms[:third], shiftz1)
    O = tree_combine(ms[third : 2 * third], shiftz1)
    S = tree_combine(ms[2 * third :], shiftz1)
    k = len(E)
    yo = [shiftz1(O[-1])] + O[: k - 1]
    res_e = [a + b for a, b in zip(E, yo)]
    res_o = [s - a - b for s, a, b in zip(S, E, O)]
    out = []
    for i in range(k):
        out.append(res_e[i])
        out.append(res_o[i])
    return out


# --------------------------------------------------------------------- #
# In-kernel residue-layout rotation
# --------------------------------------------------------------------- #
def _neg_u32(v):
    return (~v + U32(1)).astype(U32)


def _roll_y_static_seg(x, s: int, nh: int, nseg: int):
    """x (tb, nseg*nh) u32: multiply every segment by Z^s (static s in
    [0, 2*nh)) under Z^nh = -1."""
    s = s % (2 * nh)
    neg = s >= nh
    if neg:
        s -= nh
    if s == 0:
        out = x
    else:
        parts = []
        for g in range(nseg):
            seg = x[:, g * nh : (g + 1) * nh]
            parts.append(_neg_u32(seg[:, nh - s :]))
            parts.append(seg[:, : nh - s])
        out = jnp.concatenate(parts, axis=1)
    return _neg_u32(out) if neg else out


def _mul_xpow_res(x, ns: int, R: int, sh: int):
    """Multiply by X^sh (0 < sh < R) in residue layout: new[i] = r[i-sh],
    wrapped residues get one Z factor (negacyclic shift-by-1 at size ns)."""
    parts = []
    for p in range(2):
        r = [x[:, (R * p + i) * ns : (R * p + i + 1) * ns] for i in range(R)]
        for i in range(R):
            src = i - sh
            if src >= 0:
                parts.append(r[src])
            else:
                v = r[R + src]
                parts.append(
                    jnp.concatenate([_neg_u32(v[:, ns - 1 :]), v[:, : ns - 1]], axis=1)
                )
    return jnp.concatenate(parts, axis=1)


def _rotate_res_inkernel(x, n_col, ns: int, levels: int):
    """x (tb, 2*R*ns) u32 residue layout, n_col (tb, 1) int32 in [0, 2N):
    returns X^n * x.  Low ``levels`` bits barrel-shift residues; the rest
    is the Z^t binary rotation over all 2R segments at once."""
    R = 1 << levels
    out = x
    for b in range(levels):
        bit = ((n_col >> b) & 1) == 1
        out = jnp.where(bit, _mul_xpow_res(out, ns, R, 1 << b), out)
    t_bits = (2 * ns - 1).bit_length()
    for k in range(t_bits):
        bit = ((n_col >> (k + levels)) & 1) == 1
        out = jnp.where(bit, _roll_y_static_seg(out, 1 << k, ns, 2 * R), out)
    return out


# --------------------------------------------------------------------- #
# Shared in-kernel dot + recombination core
# --------------------------------------------------------------------- #
def _shiftz1_i32(m, ns: int):
    return jnp.concatenate([-m[:, ns - 1 :], m[:, : ns - 1]], axis=1)


def _shiftz1_u32(m, ns: int):
    return jnp.concatenate([_neg_u32(m[:, ns - 1 :]), m[:, : ns - 1]], axis=1)


def _karatsuba_accumulate(dj, w_vmem, c, *, ns, lvls, T, num_limbs, limb_bits,
                          tm, tb):
    """dj: per digit plane j, a list of T = 3^L int8 (tb, ns) operand
    planes (tree_planes order); w_vmem[c]: panel rows g=((j*K+l)*T+t)*tm.
    Returns 2^L u32 residue outputs (the external-product contribution).

    Limb recombination happens per LEAF (u32 wrapping shift-add of the
    int32 per-limb dot sums), so tree_combine runs ONCE over u32 planes
    instead of once per limb — tree_combine is linear with integer
    coefficients, so it commutes with the mod-2^32 reduction.  Measured
    (benches/combine_order_probe.py): T*(2K-1) leaf recombine ops + one
    combine beats K combines + R*K output shift-adds for T >= 3."""
    leaves = []
    for t in range(T):
        leaf = None
        for l in range(num_limbs):
            part = jnp.zeros((tb, ns), I32)
            for j in range(2 * lvls):
                r0 = ((j * num_limbs + l) * T + t) * tm
                for mb in range(ns // tm):
                    d_blk = dj[j][t][:, mb * tm : (mb + 1) * tm]
                    col0 = (ns - tm) - mb * tm
                    w_blk = w_vmem[c, r0 : r0 + tm, col0 : col0 + ns]
                    part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
            contrib = part.astype(U32) if l == 0 else (
                part.astype(U32) << U32(limb_bits * l)
            )
            leaf = contrib if leaf is None else leaf + contrib
        leaves.append(leaf)
    return tree_combine(leaves, lambda v: _shiftz1_u32(v, ns))


# --------------------------------------------------------------------- #
# Fused CMux step kernel (residue layout)
# --------------------------------------------------------------------- #
def _kernel_step_k(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params,
                   levels, num_limbs, limb_bits, tb, tm, unroll=1):
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

    acc = acc_ref[:, :]  # (tb, 2*R*ns) u32 residue layout
    for s in range(unroll):
        n_col = n_ref[:, s : s + 1]  # (tb, 1) int32
        rot = _rotate_res_inkernel(acc, n_col, ns, levels)
        diff = (rot - acc).astype(U32)
        u = (diff + mask) ^ mask  # decomposition carry, whole plane at once

        # Digit extraction per level over the whole plane, then the Karatsuba
        # operand tree per (p, lv).  Each balanced digit is the bgbit-bit sign
        # extension of its window, extracted with two static shifts (shl to the
        # top, arithmetic shr back) — measured 2.098 vs 2.110 ms/step against
        # the shift+and+and+mul+add form (benches/vpu_reduce_probe.py,
        # 2026-08-20, same session, exact on device).  Sums are taken in int32
        # (Mosaic has no int8 vector add) and cast down:
        # |sum| <= Bg/2 * 2^levels <= 128.
        ui = jax.lax.bitcast_convert_type(u, I32)
        dig_planes = []
        for lv in range(lvls):
            dig_planes.append(
                (ui << I32(params.bgbit * lv)) >> I32(32 - params.bgbit)
            )
        dj = []  # j = p*lvls + lv -> T int8 operand planes
        for p in (0, 1):
            base = R * p * ns
            for lv in range(lvls):
                d = dig_planes[lv]
                res = [d[:, base + i * ns : base + (i + 1) * ns] for i in range(R)]
                planes = tree_planes(res, lambda a, b: a + b)
                dj.append([x.astype(I8) for x in planes])

        new_segs = []
        for c in (0, 1):
            outs = _karatsuba_accumulate(
                dj, w_vmem.at[s] if unroll > 1 else w_vmem, c, ns=ns,
                lvls=lvls, T=T, num_limbs=num_limbs, limb_bits=limb_bits,
                tm=tm, tb=tb,
            )
            for i in range(R):
                seg = slice((R * c + i) * ns, (R * c + i + 1) * ns)
                new_segs.append(acc[:, seg] + outs[i])
        if s == unroll - 1:
            for gi in range(2 * R):
                o_ref[:, gi * ns : (gi + 1) * ns] = new_segs[gi]
        else:
            # intermediate accumulator stays in VMEM/registers — the acc
            # HBM round trip is paid once per unroll group, not per step.
            acc = jnp.concatenate(new_segs, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("params", "levels", "num_limbs", "limb_bits", "tb", "tm",
                     "unroll", "interpret"),
)
def fused_cmux_step_k(acc_flat, a_tilde, panels, *, params, levels=1,
                      num_limbs=4, limb_bits=8, tb=128, tm=TM, unroll=1,
                      interpret=False):
    """``unroll`` blind-rotate steps in residue layout: acc_flat (B, 2N)
    u32, a_tilde (B,) int32 in [0, 2N) (or (B, unroll) for unroll > 1),
    panels from build_panels_doubling(prepared, N >> levels, tm), stacked
    on a leading unroll axis when unroll > 1 -> new acc (B, 2N)."""
    B = acc_flat.shape[0]
    T = 3 ** levels
    ns = params.N >> levels
    rows = 2 * params.l * num_limbs * T * tm
    width = 2 * ns - tm
    assert B % tb == 0 and ns % tm == 0
    pshape = (unroll, 2, rows, width) if unroll > 1 else (2, rows, width)
    assert panels.shape == pshape, (panels.shape, pshape)

    # Propagate varying-mesh-axes so the kernel composes with shard_map
    # under check_vma (e.g. acc varying over 'data', panels replicated).
    vma = (jax.typeof(acc_flat).vma | jax.typeof(a_tilde).vma
           | jax.typeof(panels).vma)
    return pl.pallas_call(
        functools.partial(
            _kernel_step_k, params=params, levels=levels, num_limbs=num_limbs,
            limb_bits=limb_bits, tb=tb, tm=tm, unroll=unroll,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * params.N), U32, vma=vma),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tb, 2 * params.N), lambda b: (b, 0)),
            pl.BlockSpec((tb, unroll), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 2 * params.N), lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM(pshape, I8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * (2 * params.l) * num_limbs * T * ns * ns * unroll,
            bytes_accessed=B * 2 * params.N * 4 * 2 + 2 * rows * width * unroll,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(panels, acc_flat, a_tilde.astype(I32).reshape(B, unroll))


# --------------------------------------------------------------------- #
# Single-launch latency rotation: ALL n steps in one kernel, panel blocks
# auto-pipelined by the Pallas grid (the B=1 lever — see rotate_all_steps)
# --------------------------------------------------------------------- #
def _kernel_rotate_all(pan_ref, acc_in_ref, n_ref, o_ref, *, params, levels,
                       num_limbs, limb_bits, tb, tm):
    step = pl.program_id(1)  # steps are the INNER grid dim (acc persists)
    R = 1 << levels
    T = 3 ** levels
    ns = params.N // R
    lvls = params.l
    mask = U32(params.decomp_mask)

    @pl.when(step == 0)
    def _():
        o_ref[:, :] = acc_in_ref[:, :]

    acc = o_ref[:, :]  # carried across the sequential step grid in VMEM
    # n_ref holds the WHOLE (tb, n_steps) schedule (TPU block rules forbid
    # a (tb, 1) block, and Mosaic cannot prove a dynamic lane offset is
    # 128-aligned); this step's column comes out via a masked reduction —
    # a trivially vectorized (tb, n_steps) pass.
    n_all = n_ref[:, :]
    col = jax.lax.broadcasted_iota(I32, n_all.shape, 1)
    n_col = jnp.sum(jnp.where(col == step, n_all, 0), axis=1,
                    keepdims=True)  # (tb, 1) int32
    rot = _rotate_res_inkernel(acc, n_col, ns, levels)
    diff = (rot - acc).astype(U32)
    u = (diff + mask) ^ mask
    ui = jax.lax.bitcast_convert_type(u, I32)
    dig_planes = []
    for lv in range(lvls):
        dig_planes.append((ui << I32(params.bgbit * lv)) >> I32(32 - params.bgbit))
    dj = []
    for p in (0, 1):
        base = R * p * ns
        for lv in range(lvls):
            d = dig_planes[lv]
            res = [d[:, base + i * ns : base + (i + 1) * ns] for i in range(R)]
            planes = tree_planes(res, lambda a, b: a + b)
            dj.append([x.astype(I8) for x in planes])

    new_segs = []
    for c in (0, 1):
        leaves = []
        for t in range(T):
            leaf = None
            for l in range(num_limbs):
                part = jnp.zeros((tb, ns), I32)
                for j in range(2 * lvls):
                    r0 = ((j * num_limbs + l) * T + t) * tm
                    for mb in range(ns // tm):
                        d_blk = dj[j][t][:, mb * tm : (mb + 1) * tm]
                        col0 = (ns - tm) - mb * tm
                        w_blk = pan_ref[0, c, r0 : r0 + tm, col0 : col0 + ns]
                        part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
                contrib = part.astype(U32) if l == 0 else (
                    part.astype(U32) << U32(limb_bits * l)
                )
                leaf = contrib if leaf is None else leaf + contrib
            leaves.append(leaf)
        outs = tree_combine(leaves, lambda v: _shiftz1_u32(v, ns))
        for i in range(R):
            seg = slice((R * c + i) * ns, (R * c + i + 1) * ns)
            new_segs.append(acc[:, seg] + outs[i])
    for gi in range(2 * R):
        o_ref[:, gi * ns : (gi + 1) * ns] = new_segs[gi]


@functools.partial(
    jax.jit,
    static_argnames=("params", "levels", "num_limbs", "limb_bits", "tb", "tm",
                     "interpret"),
)
def fused_rotate_all_k(acc_flat, a_tilde, panels_all, *, params, levels=1,
                       num_limbs=4, limb_bits=8, tb=128, tm=TM,
                       interpret=False):
    """The ENTIRE n-step blind rotation as ONE kernel launch: the grid
    iterates the (sequential) steps, the accumulator stays resident in
    the revisited output block in VMEM, and each step's panel table block
    streams from HBM with the Pallas grid pipeline — the next step's
    ~21 MB panel DMA overlaps the current step's compute instead of being
    a synchronous per-step wait (the small-batch latency floor: at B=1
    the per-step DMA wait + kernel launch were ~60% of the 40 ms
    bootstrap; see benches/repl_latency_probe.py).

    Batches over one tile run as an OUTER batch-tile grid dimension (steps
    stay innermost so the revisited output block keeps the accumulator in
    VMEM); each tile re-streams the panel sequence, which stays overlapped
    — per tile the 26 us/step panel DMA ~= the 128-lane step compute, so
    multi-tile throughput holds while the latency floor applies at any
    batch.

    acc_flat (B, 2N) u32 residue layout with B a multiple of tb (pad
    outside); a_tilde (B, n_steps) int32 in [0, 2N); panels_all
    (n_steps, 2, rows, width) int8 from prepare_panels.  Returns the
    rotated accumulator (B, 2N).
    """
    B = acc_flat.shape[0]
    n_steps = panels_all.shape[0]
    T = 3 ** levels
    ns = params.N >> levels
    rows = 2 * params.l * num_limbs * T * tm
    width = 2 * ns - tm
    assert B % tb == 0, (B, tb)
    assert panels_all.shape == (n_steps, 2, rows, width), panels_all.shape
    assert a_tilde.shape == (B, n_steps), a_tilde.shape

    vma = (jax.typeof(acc_flat).vma | jax.typeof(a_tilde).vma
           | jax.typeof(panels_all).vma)
    return pl.pallas_call(
        functools.partial(
            _kernel_rotate_all, params=params, levels=levels,
            num_limbs=num_limbs, limb_bits=limb_bits, tb=tb, tm=tm,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * params.N), U32, vma=vma),
        grid=(B // tb, n_steps),
        in_specs=[
            pl.BlockSpec((1, 2, rows, width), lambda b, s: (s, 0, 0, 0)),
            pl.BlockSpec((tb, 2 * params.N), lambda b, s: (b, 0)),
            pl.BlockSpec((tb, n_steps), lambda b, s: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 2 * params.N), lambda b, s: (b, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * (2 * params.l) * num_limbs * T * ns * ns
            * n_steps,
            bytes_accessed=n_steps * 2 * rows * width + B * 2 * params.N * 4 * 2,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(panels_all, acc_flat, a_tilde.astype(I32))


# --------------------------------------------------------------------- #
# Standalone external product kernel (digits precomputed, residue in/out)
# --------------------------------------------------------------------- #
def _kernel_extprod_k(w_hbm, d_ref, o_ref, w_vmem, sem, *, params, levels,
                      num_limbs, limb_bits, tb, tm):
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

    dj = []
    for j in range(2 * lvls):
        dj.append([
            d_ref[:, (j * T + t) * ns : (j * T + t + 1) * ns] for t in range(T)
        ])
    for c in (0, 1):
        outs = _karatsuba_accumulate(
            dj, w_vmem, c, ns=ns, lvls=lvls, T=T, num_limbs=num_limbs,
            limb_bits=limb_bits, tm=tm, tb=tb,
        )
        for i in range(R):
            seg = slice((R * c + i) * ns, (R * c + i + 1) * ns)
            o_ref[:, seg] = outs[i]


@functools.partial(
    jax.jit,
    static_argnames=("params", "levels", "num_limbs", "limb_bits", "tb", "tm", "interpret"),
)
def fused_external_product_k(digits_flat, panels, *, params, levels=1,
                             num_limbs=4, limb_bits=8, tb=128, tm=TM,
                             interpret=False):
    """digits_flat: int8 (B, 2L*3^L*ns) [per j: tree_planes order]; panels
    int8 (2, 2L*K*3^L*tm, 2*ns - tm) -> u32 (B, 2N) residue layout."""
    B = digits_flat.shape[0]
    T = 3 ** levels
    ns = params.N >> levels
    rows = 2 * params.l * num_limbs * T * tm
    width = 2 * ns - tm
    assert B % tb == 0 and ns % tm == 0
    assert panels.shape == (2, rows, width), panels.shape

    vma = jax.typeof(digits_flat).vma | jax.typeof(panels).vma
    return pl.pallas_call(
        functools.partial(
            _kernel_extprod_k, params=params, levels=levels,
            num_limbs=num_limbs, limb_bits=limb_bits, tb=tb, tm=tm,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * params.N), U32, vma=vma),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tb, 2 * params.l * T * ns), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 2 * params.N), lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, width), I8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * (2 * params.l) * num_limbs * T * ns * ns,
            bytes_accessed=B * 2 * params.l * T * ns + 2 * rows * width
            + B * 2 * params.N * 4,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(panels, digits_flat)


# --------------------------------------------------------------------- #
# Engine
# --------------------------------------------------------------------- #
class PallasKaratsubaEngine:
    """PolyEngine with Karatsuba-split fused Pallas external product/CMux.

    ``levels``: even/odd split depth (1 or 2 — the digit tree sums must
    stay in int8: Bg/2 * 2^levels <= 128 at bgbit=6).
    Key switch and torus-x-binary products reuse the XLA matmul paths.
    """

    def __init__(self, interpret: bool = False, tb: int = 128, tm: int = TM,
                 levels: int = 1):
        from .matmul import MatmulEngine

        self._base = MatmulEngine(limb_bits=8, use_bf16=False)
        self.limb_bits = 8
        self.num_limbs = 4
        self.interpret = interpret
        self.tb = tb
        self.tm = tm
        self.levels = levels
        self.fuse_step = True
        self.name = f"pallas_k{levels}" if levels > 1 else "pallas_k"

    # -------------------------- scan layout -------------------------- #
    def scan_enter(self, acc, params):
        """(..., 2, N) u32 -> (..., 2N) residue layout [p0r0..p1r_{R-1}]."""
        R = 1 << self.levels
        ns = params.N // R
        eo = jnp.moveaxis(acc.reshape(acc.shape[:-1] + (ns, R)), -1, -2)
        return eo.reshape(acc.shape[:-2] + (2 * params.N,))

    def scan_exit(self, flat, params):
        """Inverse of scan_enter."""
        R = 1 << self.levels
        ns = params.N // R
        eo = flat.reshape(flat.shape[:-1] + (2, R, ns))
        x = jnp.moveaxis(eo, -2, -1)  # (..., p, i, residue)
        return x.reshape(flat.shape[:-1] + (2, params.N))

    # -------------------------- preparation -------------------------- #
    def prepare_trgsw(self, rows, params):
        """rows u32 (..., 2L, 2, N) -> int8 (..., 2, 2L*K*3^L, 2*ns) doubled
        leaf-size limb tables; row group order g = (j*K + l)*3^L + t with
        t in tree_planes order."""
        assert params.half_bg * (1 << self.levels) <= 128, (
            "digit tree sums must fit int8"
        )
        rows = jnp.asarray(rows, U32)
        R = 1 << self.levels
        T = 3 ** self.levels
        ns = params.N // R
        res = [rows[..., i::R] for i in range(R)]
        planes = tree_planes(res, lambda a, b: (a + b).astype(U32))
        q = jnp.stack(planes, axis=-2)  # (..., 2L, 2, T, ns)
        # Doubled table [limbs(q), limbs(-q)] — same reasoning as
        # MatmulEngine.prepare_trgsw (limb-wise negation would overflow int8).
        from ..poly import to_signed_limbs

        neg = (~q + U32(1)).astype(U32)
        limbs = jnp.moveaxis(
            to_signed_limbs(q, self.limb_bits, self.num_limbs), -1, -2
        )  # (..., 2L, 2, T, K, ns)
        nlimbs = jnp.moveaxis(
            to_signed_limbs(neg, self.limb_bits, self.num_limbs), -1, -2
        )
        dbl = jnp.concatenate([limbs, nlimbs], axis=-1)  # (..., 2L, 2, T, K, 2ns)
        nd = dbl.ndim
        j_, c_, t_, l_, n_ = nd - 5, nd - 4, nd - 3, nd - 2, nd - 1
        dbl = jnp.transpose(dbl, tuple(range(nd - 5)) + (c_, j_, l_, t_, n_))
        return dbl.reshape(
            dbl.shape[: nd - 5] + (2, 2 * params.l * self.num_limbs * T, 2 * ns)
        )

    # --------------------- latency-mode panel precompute -------------- #
    def prepare_panels(self, prepared, params):
        """Prepared TRGSW rows (..., 2, 2L*K*3^L, 2ns) -> the per-step
        kernel panel tables (..., 2, 2L*K*3^L*tm, 2ns - tm) built ONCE.

        Latency mode: at large batches the per-step XLA panel build
        (~42 MB moved) hides under the kernel, but at small batches it IS
        the step (B=128: 187 ms/batch, build-dominated).  Precomputing all
        n panel tables costs n * 21 MB HBM (13.5 GB at production
        parameters — fits v5e HBM alongside small-batch accumulators;
        measured too slow/no-gain for the B>=8192 throughput path, see
        ROADMAP "refuted levers", which this does NOT change).
        ``cmux_step`` detects the panel form by its trailing width."""
        ns = params.N >> self.levels
        lead = prepared.shape[:-3]
        flat = prepared.reshape((-1,) + prepared.shape[-3:])
        panels = jax.lax.map(
            lambda q: build_panels_doubling(q, ns, self.tm), flat
        )
        return panels.reshape(lead + panels.shape[1:])

    def panels_nbytes(self, prepared, params) -> int:
        """HBM bytes ``prepare_panels(prepared)`` would allocate (int8
        table, so bytes == element count).  Used by the keygen-side guard
        (keys.cloud_key_panels) to fail with a clear error BEFORE XLA
        RESOURCE_EXHAUSTs: 12.6 GiB at the default set, 47 GB at N=2048."""
        import numpy as np

        ns = params.N >> self.levels
        lead_rows = int(np.prod(prepared.shape[:-1], dtype=np.int64))
        return lead_rows * self.tm * (2 * ns - self.tm)

    def _panels_of(self, prepared, params):
        ns = params.N >> self.levels
        if prepared.shape[-1] == 2 * ns - self.tm:
            return prepared  # already panel-form (prepare_panels)
        return build_panels_doubling(prepared, ns, self.tm)

    # ---------------------------- hot path --------------------------- #
    def cmux_step(self, prepared, acc_flat, a_i, params):
        """Fused blind-rotate step in residue layout: acc_flat (..., 2N)
        u32 (from scan_enter), a_i (...,) int32 in [0, 2N).  ``prepared``
        is either the doubled limb table (panel built per step) or a
        precomputed panel table from ``prepare_panels`` (latency mode)."""
        ns = params.N >> self.levels
        lead = acc_flat.shape[:-1]
        a2 = acc_flat.reshape((-1, 2 * params.N))
        n2 = a_i.reshape((-1,))
        pad = (-a2.shape[0]) % self.tb
        if pad:
            a2 = jnp.pad(a2, ((0, pad), (0, 0)))
            n2 = jnp.pad(n2, ((0, pad),))
        panels = self._panels_of(prepared, params)
        out = fused_cmux_step_k(
            a2, n2, panels, params=params, levels=self.levels,
            num_limbs=self.num_limbs, limb_bits=self.limb_bits, tb=self.tb,
            tm=self.tm, interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return out.reshape(lead + (2 * params.N,))

    def rotate_all_steps(self, bk_prepared, acc_flat, a_steps, params):
        """Single-launch blind rotation over ALL steps (fused_rotate_all_k)
        — the small-batch latency path.  Requires a latency-mode key
        (panel-form BK with a leading step axis, keys.cloud_key_panels)
        and a flattened batch <= tb; returns None otherwise so the caller
        falls back to the per-step scan (whose per-step panel build is
        overlapped at large batches anyway)."""
        ns = params.N >> self.levels
        if not (hasattr(bk_prepared, "ndim") and bk_prepared.ndim == 4
                and bk_prepared.shape[-1] == 2 * ns - self.tm):
            return None  # not a panel-form latency key
        lead = acc_flat.shape[:-1]
        n_steps = bk_prepared.shape[0]
        a2 = acc_flat.reshape((-1, 2 * params.N))
        n2 = jnp.moveaxis(a_steps, 0, -1).reshape((-1, n_steps))
        if a2.shape[0] > 32 * self.tb:
            # Each tile re-streams the 13.5 GB panel sequence; past ~32
            # tiles the per-step scan (panels built once per step for the
            # WHOLE batch) wins on HBM traffic — measured crossover
            # B ~ 4-8k (BENCH.md round 4).  The fallback is the right
            # call, but the caller paid ~12.6 GiB of HBM for a panel key
            # that this batch size cannot use — say so ONCE (VERDICT r4
            # weak #4: silent fallbacks hide configuration mistakes).
            import warnings

            if not getattr(self, "_warned_panel_fallback", False):
                self._warned_panel_fallback = True
                warnings.warn(
                    f"latency-mode panel key ignored for flattened batch "
                    f"{a2.shape[0]} > {32 * self.tb}: the single-launch "
                    "rotation kernel caps at 32 tiles (panel re-streaming "
                    "loses beyond it) and this call uses the per-step scan "
                    "instead — use the STANDARD key for large-batch "
                    "throughput (the panel table only helps small "
                    "batches; keys.cloud_key_panels docstring)",
                    stacklevel=3,
                )
            return None
        pad = (-a2.shape[0]) % self.tb
        if pad:
            a2 = jnp.pad(a2, ((0, pad), (0, 0)))
            n2 = jnp.pad(n2, ((0, pad), (0, 0)))
        out = fused_rotate_all_k(
            a2, n2, bk_prepared, params=params, levels=self.levels,
            num_limbs=self.num_limbs, limb_bits=self.limb_bits, tb=self.tb,
            tm=self.tm, interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return out.reshape(lead + (2 * params.N,))

    def cmux_step_pair(self, prep_even, panels_odd, acc_flat, a_pair, params):
        """TWO fused blind-rotate steps (hybrid mode, keys.cloud_key_hybrid):
        the even step's panel table is built per call (overlapped by XLA as
        in the standard scan), the odd step's comes PREBUILT; the
        intermediate accumulator never round-trips HBM.  Measured 1.730 vs
        1.863 ms/step same-session at B=8192 (+7.7%;
        benches/hybrid_unroll_probe.py, bit-exact vs two standard steps).

        acc_flat (..., 2N) u32 residue layout; a_pair (2, ...) int32."""
        ns = params.N >> self.levels
        lead = acc_flat.shape[:-1]
        a2 = acc_flat.reshape((-1, 2 * params.N))
        n2 = jnp.moveaxis(a_pair, 0, -1).reshape((-1, 2))
        pad = (-a2.shape[0]) % self.tb
        if pad:
            a2 = jnp.pad(a2, ((0, pad), (0, 0)))
            n2 = jnp.pad(n2, ((0, pad), (0, 0)))
        # prep_even may come prebuilt too (cloud_key_hybrid full_panels —
        # the zero-in-step-build latency configuration); _panels_of
        # detects panel form by its doubled-row layout.
        pan_e = self._panels_of(prep_even, params)
        panels = jnp.stack([pan_e, panels_odd])
        out = fused_cmux_step_k(
            a2, n2, panels, params=params, levels=self.levels,
            num_limbs=self.num_limbs, limb_bits=self.limb_bits, tb=self.tb,
            tm=self.tm, unroll=2, interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return out.reshape(lead + (2 * params.N,))

    def external_product_digits(self, prepared, digits, params):
        """digits int32 (..., 2L, N) -> u32 (..., 2, N) (standard layout)."""
        R = 1 << self.levels
        T = 3 ** self.levels
        ns = params.N // R
        lead = digits.shape[:-2]
        res = [digits[..., i::R] for i in range(R)]
        planes = tree_planes(res, lambda a, b: a + b)
        trip = jnp.stack(planes, axis=-2).astype(I8)  # (..., 2L, T, ns)
        d = trip.reshape((-1, 2 * params.l * T * ns))
        pad = (-d.shape[0]) % self.tb
        if pad:
            d = jnp.pad(d, ((0, pad), (0, 0)))
        panels = self._panels_of(prepared, params)
        out = fused_external_product_k(
            d, panels, params=params, levels=self.levels,
            num_limbs=self.num_limbs, limb_bits=self.limb_bits, tb=self.tb,
            tm=self.tm, interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return self.scan_exit(out.reshape(lead + (2 * params.N,)), params)

    # ------------------------- delegated ops ------------------------- #
    def prepare_ksk(self, ksk_raw, params):
        return self._base.prepare_ksk(ksk_raw, params)

    def key_switch_digits(self, prepared, digits, params):
        return self._base.key_switch_digits(prepared, digits, params)

    def poly_mul_torus_binary(self, a, s, params):
        return self._base.poly_mul_torus_binary(a, s, params)
