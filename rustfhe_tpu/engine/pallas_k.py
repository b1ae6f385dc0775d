"""Karatsuba even/odd Pallas engine (TPU): 0.75x MXU MACs per CMux step.

Negacyclic degree-N convolution via the even/odd split (reference hot loop:
trgsw.rs:264-330 + tfhe.rs:103-110; this engine replaces the spqlios f64 FFT
with exact integer arithmetic like engine/pallas_step.py, then cuts the MXU
work by a Karatsuba level):

  a(X) = ae(Y) + X ao(Y),  Y = X^2,  Y^(N/2) = -1  (half-size negacyclic)

  (a (*) q)_e = ae (*) qe + Y * (ao (*) qo)
  (a (*) q)_o = (ae+ao) (*) (qe+qo) - ae (*) qe - ao (*) qo

Three half-size convolutions (3 * (N/2)^2 = 0.75 N^2 MACs) instead of one
full-size one.  All sums stay exact:

* digit side: |d_e + d_o| <= Bg = 64 -> int8 operand.
* key side: qe + qo is computed mod 2^32 FIRST, then limb-split to int8
  (the conv result is mod 2^32, so the wrapped sum recombines exactly).
* accumulators: |sum| <= 2L * (N/2) * Bg * 2^(limb_bits-1) ~= 2^24.6, exact
  in int32; Karatsuba recombination (E = M0 + Y*M1, O = M2 - M0 - M1) is
  linear, so it commutes with the per-limb wrapping shift-add mod 2^32.

The blind-rotate accumulator lives in the even/odd ("e/o") layout for the
WHOLE scan — one (tb, 2N) lane plane with segments [p0e | p0o | p1e | p1o]
(p = TRLWE poly half, e/o = coefficient parity) — so the per-step VPU work
(rotation, decomposition, digit extraction) runs once over a single wide
plane instead of twice per poly half (ROADMAP lever 2):

* X^s rotation in e/o layout: s = 2t + r; the r bit swaps (e,o) ->
  (Y*o, e); Y^t is the ordinary half-size negacyclic binary rotation
  applied to all four segments at once — same 11 select stages as the
  full-size rotation, on one plane.
* One de-interleave at scan entry/exit only (engine.scan_enter/scan_exit).

Limb recombination is hoisted: digit-plane convolutions accumulate over all
2L planes in int32 first, then ONE wrapping shift-add per (c, limb).
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
# In-kernel e/o-layout rotation
# --------------------------------------------------------------------- #
def _neg_u32(v):
    return (~v + U32(1)).astype(U32)


def _roll_y_static_seg(x, s: int, nh: int, nseg: int):
    """x (tb, nseg*nh) u32: multiply every segment by Y^s (static s in
    [0, 2*nh)) under Y^nh = -1."""
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


def _mul_x_seg(x, nh: int):
    """Multiply by X in e/o layout: (e, o) -> (Y*o, e) per poly half."""
    parts = []
    for p in range(2):
        e = x[:, (2 * p) * nh : (2 * p + 1) * nh]
        o = x[:, (2 * p + 1) * nh : (2 * p + 2) * nh]
        yo = jnp.concatenate([_neg_u32(o[:, nh - 1 :]), o[:, : nh - 1]], axis=1)
        parts += [yo, e]
    return jnp.concatenate(parts, axis=1)


def _rotate_eo_inkernel(x, n_col, nh: int):
    """x (tb, 4*nh) u32 e/o layout, n_col (tb, 1) int32 in [0, 4*nh):
    returns X^n * x.  n = 2t + r: apply the X bit, then Y^t by binary
    stages over all four segments at once."""
    out = jnp.where((n_col & 1) == 1, _mul_x_seg(x, nh), x)
    t_bits = (2 * nh - 1).bit_length()
    for k in range(t_bits):
        bit = ((n_col >> (k + 1)) & 1) == 1
        out = jnp.where(bit, _roll_y_static_seg(out, 1 << k, nh, 4), out)
    return out


# --------------------------------------------------------------------- #
# Shared in-kernel Karatsuba dot + recombination core
# --------------------------------------------------------------------- #
def _karatsuba_accumulate(dj, w_vmem, c, acc_old_e, acc_old_o, *, nh, lvls,
                          num_limbs, limb_bits, tm, tb):
    """dj: list of (d_e, d_o, d_s) int8 (tb, nh) triples per digit plane j;
    w_vmem[c]: panel table rows g = ((j*K + l)*3 + t) * tm.  Returns the
    e and o output segments (u32) including the old accumulator."""
    acc_e = jnp.zeros((tb, nh), U32)
    acc_o = jnp.zeros((tb, nh), U32)
    for l in range(num_limbs):
        m = [jnp.zeros((tb, nh), I32) for _ in range(3)]
        for j in range(2 * lvls):
            trip = dj[j]
            for t in range(3):
                r0 = ((j * num_limbs + l) * 3 + t) * tm
                for mb in range(nh // tm):
                    d_blk = trip[t][:, mb * tm : (mb + 1) * tm]
                    col0 = (nh - tm) - mb * tm
                    w_blk = w_vmem[c, r0 : r0 + tm, col0 : col0 + nh]
                    m[t] += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
        # E = M0 + Y*M1, O = M2 - M0 - M1 (exact int32; <= ~2^26).
        y_m1 = jnp.concatenate([-m[1][:, nh - 1 :], m[1][:, : nh - 1]], axis=1)
        e_part = m[0] + y_m1
        o_part = m[2] - m[0] - m[1]
        sh = U32(limb_bits * l)
        acc_e = acc_e + (e_part.astype(U32) << sh)
        acc_o = acc_o + (o_part.astype(U32) << sh)
    return (acc_old_e + acc_e).astype(U32), (acc_old_o + acc_o).astype(U32)


# --------------------------------------------------------------------- #
# Fused CMux step kernel (e/o layout)
# --------------------------------------------------------------------- #
def _kernel_step_k(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params,
                   num_limbs, limb_bits, tb, tm):
    b = pl.program_id(0)
    nh = params.N // 2
    lvls = params.l
    mask = U32(params.decomp_mask)
    half = U32(params.half_bg)
    digit_mask = U32(params.bg - 1)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    n_col = n_ref[:, 0:1]  # (tb, 1) int32
    acc = acc_ref[:, :]  # (tb, 4*nh) u32, segments [p0e|p0o|p1e|p1o]
    rot = _rotate_eo_inkernel(acc, n_col, nh)
    diff = (rot - acc).astype(U32)
    u = (diff + mask) ^ mask  # decomposition carry, whole plane at once

    # Digit extraction per level over the whole plane, then slice segments.
    # The e+o sum is taken in int32 (Mosaic has no int8 vector add) and
    # cast down: |d_e + d_o| <= Bg = 64 fits int8.
    dig_planes = []
    for lv in range(lvls):
        shift = U32(32 - params.bgbit * (lv + 1))
        raw = (u >> shift) & digit_mask
        dig_planes.append((raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32))
    dj = []  # j = p*lvls + lv -> (d_e, d_o, d_e + d_o)
    for p in (0, 1):
        for lv in range(lvls):
            d = dig_planes[lv]
            de = d[:, (2 * p) * nh : (2 * p + 1) * nh]
            do = d[:, (2 * p + 1) * nh : (2 * p + 2) * nh]
            dj.append((de.astype(I8), do.astype(I8), (de + do).astype(I8)))

    for c in (0, 1):
        old_e = acc[:, (2 * c) * nh : (2 * c + 1) * nh]
        old_o = acc[:, (2 * c + 1) * nh : (2 * c + 2) * nh]
        out_e, out_o = _karatsuba_accumulate(
            dj, w_vmem, c, old_e, old_o, nh=nh, lvls=lvls,
            num_limbs=num_limbs, limb_bits=limb_bits, tm=tm, tb=tb,
        )
        o_ref[:, (2 * c) * nh : (2 * c + 1) * nh] = out_e
        o_ref[:, (2 * c + 1) * nh : (2 * c + 2) * nh] = out_o


@functools.partial(
    jax.jit, static_argnames=("params", "num_limbs", "limb_bits", "tb", "tm", "interpret")
)
def fused_cmux_step_k(acc_flat, a_tilde, panels, *, params, num_limbs=4,
                      limb_bits=8, tb=128, tm=TM, interpret=False):
    """One blind-rotate step in e/o layout: acc_flat (B, 2N) u32
    ([p0e|p0o|p1e|p1o]), a_tilde (B,) int32 in [0, 2N), panels from
    build_panels_doubling(prepared, N//2, tm) -> new acc (B, 2N) u32."""
    B = acc_flat.shape[0]
    nh = params.N // 2
    rows = 2 * params.l * num_limbs * 3 * tm
    width = 2 * nh - tm
    assert B % tb == 0 and nh % tm == 0
    assert panels.shape == (2, rows, width), panels.shape

    return pl.pallas_call(
        functools.partial(
            _kernel_step_k, params=params, num_limbs=num_limbs,
            limb_bits=limb_bits, tb=tb, tm=tm,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 4 * nh), U32),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tb, 4 * nh), lambda b: (b, 0)),
            pl.BlockSpec((tb, 1), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 4 * nh), lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, width), I8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * (2 * params.l) * num_limbs * 3 * nh * nh,
            bytes_accessed=B * 4 * nh * 4 * 2 + 2 * rows * width,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(panels, acc_flat, a_tilde.astype(I32).reshape(B, 1))


# --------------------------------------------------------------------- #
# Standalone external product kernel (digits precomputed, e/o in/out)
# --------------------------------------------------------------------- #
def _kernel_extprod_k(w_hbm, d_ref, o_ref, w_vmem, sem, *, params, num_limbs,
                      limb_bits, tb, tm):
    b = pl.program_id(0)
    nh = params.N // 2
    lvls = params.l

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    dj = []
    for j in range(2 * lvls):
        trip = tuple(
            d_ref[:, (j * 3 + t) * nh : (j * 3 + t + 1) * nh] for t in range(3)
        )
        dj.append(trip)
    zero = jnp.zeros((tb, nh), U32)
    for c in (0, 1):
        out_e, out_o = _karatsuba_accumulate(
            dj, w_vmem, c, zero, zero, nh=nh, lvls=lvls,
            num_limbs=num_limbs, limb_bits=limb_bits, tm=tm, tb=tb,
        )
        o_ref[:, (2 * c) * nh : (2 * c + 1) * nh] = out_e
        o_ref[:, (2 * c + 1) * nh : (2 * c + 2) * nh] = out_o


@functools.partial(
    jax.jit, static_argnames=("params", "num_limbs", "limb_bits", "tb", "tm", "interpret")
)
def fused_external_product_k(digits_flat, panels, *, params, num_limbs=4,
                             limb_bits=8, tb=128, tm=TM, interpret=False):
    """digits_flat: int8 (B, 2L*3*nh) [per j: e|o|e+o]; panels int8
    (2, 2L*K*3*tm, 2*nh - tm) -> u32 (B, 4*nh) e/o layout."""
    B = digits_flat.shape[0]
    nh = params.N // 2
    rows = 2 * params.l * num_limbs * 3 * tm
    width = 2 * nh - tm
    assert B % tb == 0 and nh % tm == 0

    return pl.pallas_call(
        functools.partial(
            _kernel_extprod_k, params=params, num_limbs=num_limbs,
            limb_bits=limb_bits, tb=tb, tm=tm,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 4 * nh), U32),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tb, 2 * params.l * 3 * nh), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 4 * nh), lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, width), I8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * (2 * params.l) * num_limbs * 3 * nh * nh,
            bytes_accessed=B * 2 * params.l * 3 * nh + 2 * rows * width
            + B * 4 * nh * 4,
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

    Key switch and torus-x-binary products reuse the XLA matmul paths.
    """

    def __init__(self, interpret: bool = False, tb: int = 128, tm: int = TM):
        from .matmul import MatmulEngine

        self._base = MatmulEngine(limb_bits=8, use_bf16=False)
        self.limb_bits = 8
        self.num_limbs = 4
        self.interpret = interpret
        self.tb = tb
        self.tm = tm
        self.fuse_step = True
        self.name = "pallas_k"

    # -------------------------- scan layout -------------------------- #
    def scan_enter(self, acc, params):
        """(..., 2, N) u32 -> (..., 2N) e/o segment layout [p0e|p0o|p1e|p1o]."""
        nh = params.N // 2
        eo = jnp.moveaxis(acc.reshape(acc.shape[:-1] + (nh, 2)), -1, -2)
        return eo.reshape(acc.shape[:-2] + (4 * nh,))

    def scan_exit(self, flat, params):
        """Inverse of scan_enter."""
        nh = params.N // 2
        eo = flat.reshape(flat.shape[:-1] + (2, 2, nh))  # (..., p, parity, i)
        x = jnp.moveaxis(eo, -2, -1)  # (..., p, i, parity)
        return x.reshape(flat.shape[:-1] + (2, params.N))

    # -------------------------- preparation -------------------------- #
    def prepare_trgsw(self, rows, params):
        """rows u32 (..., 2L, 2, N) -> int8 (..., 2, 2L*K*3, 2*nh) doubled
        half-size limb tables; row group order g = (j*K + l)*3 + t with
        t in (qe, qo, qe+qo)."""
        rows = jnp.asarray(rows, U32)
        nh = params.N // 2
        qe = rows[..., 0::2]
        qo = rows[..., 1::2]
        qs = (qe + qo).astype(U32)  # mod 2^32 BEFORE limb split: exact
        q = jnp.stack([qe, qo, qs], axis=-2)  # (..., 2L, 2, 3, nh)
        # Doubled table [limbs(q), limbs(-q)] — same reasoning as
        # MatmulEngine.prepare_trgsw (limb-wise negation would overflow int8).
        from ..poly import to_signed_limbs

        neg = (~q + U32(1)).astype(U32)
        limbs = jnp.moveaxis(
            to_signed_limbs(q, self.limb_bits, self.num_limbs), -1, -2
        )  # (..., 2L, 2, 3, K, nh)
        nlimbs = jnp.moveaxis(
            to_signed_limbs(neg, self.limb_bits, self.num_limbs), -1, -2
        )
        dbl = jnp.concatenate([limbs, nlimbs], axis=-1)  # (..., 2L, 2, 3, K, 2nh)
        nd = dbl.ndim
        j_, c_, t_, l_, n_ = nd - 5, nd - 4, nd - 3, nd - 2, nd - 1
        dbl = jnp.transpose(dbl, tuple(range(nd - 5)) + (c_, j_, l_, t_, n_))
        return dbl.reshape(
            dbl.shape[: nd - 5] + (2, 2 * params.l * self.num_limbs * 3, 2 * nh)
        )

    # ---------------------------- hot path --------------------------- #
    def cmux_step(self, prepared, acc_flat, a_i, params):
        """Fused blind-rotate step in e/o layout: acc_flat (..., 2N) u32
        (from scan_enter), a_i (...,) int32 in [0, 2N)."""
        nh = params.N // 2
        lead = acc_flat.shape[:-1]
        a2 = acc_flat.reshape((-1, 4 * nh))
        n2 = a_i.reshape((-1,))
        pad = (-a2.shape[0]) % self.tb
        if pad:
            a2 = jnp.pad(a2, ((0, pad), (0, 0)))
            n2 = jnp.pad(n2, ((0, pad),))
        panels = build_panels_doubling(prepared, nh, self.tm)
        out = fused_cmux_step_k(
            a2, n2, panels, params=params, num_limbs=self.num_limbs,
            limb_bits=self.limb_bits, tb=self.tb, tm=self.tm,
            interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return out.reshape(lead + (4 * nh,))

    def external_product_digits(self, prepared, digits, params):
        """digits int32 (..., 2L, N) -> u32 (..., 2, N) (standard layout)."""
        nh = params.N // 2
        lead = digits.shape[:-2]
        de = digits[..., 0::2]
        do = digits[..., 1::2]
        trip = jnp.stack([de, do, de + do], axis=-2).astype(I8)  # (..., 2L, 3, nh)
        d = trip.reshape((-1, 2 * params.l * 3 * nh))
        pad = (-d.shape[0]) % self.tb
        if pad:
            d = jnp.pad(d, ((0, pad), (0, 0)))
        panels = build_panels_doubling(prepared, nh, self.tm)
        out = fused_external_product_k(
            d, panels, params=params, num_limbs=self.num_limbs,
            limb_bits=self.limb_bits, tb=self.tb, tm=self.tm,
            interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return self.scan_exit(out.reshape(lead + (4 * nh,)), params)

    # ------------------------- delegated ops ------------------------- #
    def prepare_ksk(self, ksk_raw, params):
        return self._base.prepare_ksk(ksk_raw, params)

    def key_switch_digits(self, prepared, digits, params):
        return self._base.key_switch_digits(prepared, digits, params)

    def poly_mul_torus_binary(self, a, s, params):
        return self._base.poly_mul_torus_binary(a, s, params)
