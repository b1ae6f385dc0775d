"""Pallas fused external-product kernel (TPU).

Fuses the three stages that the XLA path materializes through HBM
(windows build -> int8 matmul -> limb recombination) into one kernel:

* the per-step limb table q (2L x 2 x K rows of length 2N, ~100 KB) lives
  in VMEM; the negacyclic circulant operand is never written to HBM.
* circulant row-panels W[r, u] = q_row[(u - (r mod TM)) mod 2N] are built
  in VMEM with log2(TM) static rolls + sublane-bit selects (no gathers),
* each output tile accumulates 2L x K x (N/TM) small int8 MXU dots and
  recombines limbs with wrapping shifts into uint32 in-register.

Layout contract (matches MatmulEngine.prepare_trgsw):
  digits: int8 (B, 2L*N) — gadget digits, j-major;
  qd:     int8 (2, 2L*K, 2N) — per output poly c, rows (j,l), doubled table.
  out:    uint32 (B, 2, N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32

TM = 128  # circulant panel row count (power of two)


def _build_w0_row(qrow, tm: int):
    """qrow: (1, 2N) int8 -> W: (tm, 2N) with W[r, u] = qrow[(u-r) mod 2N].

    log2(tm) stages: stage k rolls by 2^k along the lane axis and selects
    rows whose index bit k is set — pure vector ops, small VMEM footprint
    (built one row-group at a time to stay under the scoped-vmem limit).
    """
    two_n = qrow.shape[-1]
    # Build in int32: Mosaic's int8 roll lowering lacks the scalar
    # broadcast it needs; int32 is the native lane width.
    w = jnp.broadcast_to(qrow.reshape(1, two_n), (tm, two_n)).astype(I32)
    ridx = jax.lax.broadcasted_iota(I32, (tm, 1), 0)
    k = 0
    while (1 << k) < tm:
        rolled = jnp.roll(w, 1 << k, axis=1)
        bit = ((ridx >> k) & 1) == 1
        w = jnp.where(bit, rolled, w)
        k += 1
    return w.astype(I8)


def _kernel(q_ref, d_ref, o_ref, w_ref, *, params, num_limbs, limb_bits, tb, tn):
    c, b, nn = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    N = params.N
    two_n = 2 * N
    two_l = 2 * params.l
    rows = two_l * num_limbs

    @pl.when((b == 0) & (nn == 0))
    def _():
        for g in range(rows):
            w = _build_w0_row(q_ref[0, g : g + 1, :], TM)  # (TM, 2N)
            w_ref[g * TM : (g + 1) * TM, :two_n] = w
            w_ref[g * TM : (g + 1) * TM, two_n:] = w[:, :tn]

    n0 = nn * tn
    acc = jnp.zeros((tb, tn), U32)
    for j in range(two_l):
        for l in range(num_limbs):
            part = jnp.zeros((tb, tn), I32)
            r0 = (j * num_limbs + l) * TM
            for mb in range(N // TM):
                d_blk = d_ref[:, j * N + mb * TM : j * N + (mb + 1) * TM]
                start = (n0 - mb * TM) % two_n
                start = pl.multiple_of(start, TM)
                w_blk = w_ref[r0 : r0 + TM, pl.ds(start, tn)]
                part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
            acc = acc + (part.astype(U32) << U32(limb_bits * l))
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("params", "num_limbs", "limb_bits", "tb", "tn", "interpret"))
def fused_external_product(digits_flat, qd, *, params, num_limbs=4, limb_bits=8,
                           tb=256, tn=256, interpret=False):
    """digits_flat: int8 (B, 2L*N); qd: int8 (2, 2L*K, 2N) -> uint32 (B, 2, N)."""
    B = digits_flat.shape[0]
    N = params.N
    two_l = 2 * params.l
    rows = two_l * num_limbs
    assert B % tb == 0 and N % tn == 0 and N % TM == 0

    grid = (2, B // tb, N // tn)
    out = pl.pallas_call(
        functools.partial(
            _kernel, params=params, num_limbs=num_limbs, limb_bits=limb_bits, tb=tb, tn=tn
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * N), U32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, 2 * N), lambda c, b, nn: (c, 0, 0)),
            pl.BlockSpec((tb, two_l * N), lambda c, b, nn: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda c, b, nn: (b, c * (N // tn) + nn)),
        scratch_shapes=[pltpu.VMEM((rows * TM, 2 * N + tn), I8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * two_l * N * 2 * num_limbs * N,
            bytes_accessed=B * two_l * N + 2 * rows * 2 * N + B * 2 * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qd, digits_flat)
    return out.reshape(B, 2, N)


class PallasEngine:
    """MatmulEngine-compatible engine whose external product runs fused in
    Pallas.  Key-switch / poly-mul reuse the XLA matmul engine paths."""

    def __init__(self, interpret: bool = False, tb: int = 256, tn: int = 256):
        from .matmul import MatmulEngine

        self._base = MatmulEngine(limb_bits=8, use_bf16=False)
        self.limb_bits = 8
        self.num_limbs = 4
        self.interpret = interpret
        self.tb = tb
        self.tn = tn
        self.name = "pallas"

    # shared preparation/aux paths
    def prepare_ksk(self, ksk_raw, params):
        return self._base.prepare_ksk(ksk_raw, params)

    def key_switch_digits(self, prepared, digits, params):
        return self._base.key_switch_digits(prepared, digits, params)

    def poly_mul_torus_binary(self, a, s, params):
        return self._base.poly_mul_torus_binary(a, s, params)

    def prepare_trgsw(self, rows, params):
        """(..., 2L, 2, N) u32 -> (..., 2, 2L*K, 2N) int8 (c-major layout)."""
        q = self._base.prepare_trgsw(rows, params)  # (..., 2L, 2, K, 2N)
        q = jnp.moveaxis(q, -3, -4)  # (..., 2, 2L, K, 2N)
        shape = q.shape[:-3] + (2 * params.l * self.num_limbs, q.shape[-1])
        return q.reshape(q.shape[:-4] + (2,) + shape[-2:])

    def external_product_digits(self, prepared, digits, params):
        lead = digits.shape[:-2]  # any leading batch dims (possibly none)
        d = digits.astype(I8).reshape((-1, 2 * params.l * params.N))
        pad = (-d.shape[0]) % self.tb
        if pad:
            d = jnp.pad(d, ((0, pad), (0, 0)))
        out = fused_external_product(
            d, prepared, params=params, num_limbs=self.num_limbs,
            limb_bits=self.limb_bits, tb=self.tb, tn=self.tn,
            interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return out.reshape(lead + (2, params.N))
