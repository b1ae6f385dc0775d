"""Gadget decomposition of Torus32 values, vectorized over JAX arrays.

Bit-exact re-implementation of the reference's decompositions:

* signed base-2^bits decomposition with rounding carry mask
  (``Decimal::decomposition_i32_``, ``utils/src/math.rs:561-593``): digits
  in [-Bg/2, Bg/2), MSB digit first.  Two mask constructions exist in the
  reference and they differ:
    - ``make_decomp_mask`` (math.rs:542-560): when ``32 - l*bits != 0`` the
      rounding bit at ``32-l*bits-1`` is added twice (initializer + the
      ``i=l`` loop pass), carrying up to ``32-l*bits`` — this is the constant
      the production external product uses (trgsw.rs:269).
    - the inlined variant in ``decomposition_i32`` (math.rs:581-593): ORs
      single bits, i.e. the textbook half-ulp rounding mask — this is what
      the reference's own unit-test vectors exercise (math.rs:1206-1273).
  Both are provided; ``decompose_signed`` uses the production one.
* unsigned decomposition with simple rounding used by identity key switching
  (``decomposition_u32`` math.rs:598-615 / inlined at tlwe.rs:48-63).

All pure element-wise uint32 bit manipulation: vectorizes over any batch
axes and fuses into surrounding XLA computations.
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import TFHEParams, _make_decomp_mask

U32 = jnp.uint32
I32 = jnp.int32

make_decomp_mask = _make_decomp_mask


def make_decomp_mask_inline(l: int, bits: int) -> int:
    """The inlined mask of ``decomposition_i32`` (math.rs:581-593)."""
    total = 32
    if total - l * bits != 0:
        m = 0
        for i in range(1, l + 1):
            m |= 1 << (total - i * bits - 1)
    else:
        m = 0
        for i in range(1, l):
            m |= 1 << (total - i * bits - 1)
    return m & 0xFFFFFFFF


def decompose_signed_custom(x, bits: int, l: int, mask: int) -> jnp.ndarray:
    """Signed decomposition with an explicit rounding mask.

    Returns int32 ``(..., l)`` digits in [-2^(bits-1), 2^(bits-1)), MSB first:
    ``u = (x +wrap mask) ^ mask``; digit_i = sign-extended
    ``(u >> (32 - bits*(i+1))) & (2^bits - 1)`` (math.rs:561-577).
    """
    mask = U32(mask)
    digit_mask = U32((1 << bits) - 1)
    half = U32(1 << (bits - 1))

    x = jnp.asarray(x, U32)
    u = (x + mask) ^ mask
    shifts = jnp.array([32 - bits * (i + 1) for i in range(l)], U32)
    raw = (u[..., None] >> shifts) & digit_mask
    # Sign-extend `bits`-wide digits: raw + (raw & half) * 0xFFFFFFFE
    # == raw - 2*(raw & half) mod 2^32 (math.rs:570-573).
    ext = raw + (raw & half) * U32(0xFFFFFFFE)
    return ext.astype(I32)


def decompose_signed(x, params: TFHEParams) -> jnp.ndarray:
    """Production signed gadget decomposition: (..., ) -> (..., l) int32."""
    return decompose_signed_custom(x, params.bgbit, params.l, params.decomp_mask)


def iks_round_constant(bits: int, l: int) -> int:
    """Key-switch rounding constant (tlwe.rs:50-54) — the single source of
    truth shared with ``TFHEParams.iks_round``."""
    rem = 32 - l * bits
    return (1 << (rem - 1)) if rem != 0 else 0


def decompose_unsigned_custom(x, bits: int, l: int) -> jnp.ndarray:
    """Unsigned decomposition with rounding: (...,) -> (..., l) uint32 in [0, 2^bits)."""
    digit_mask = U32((1 << bits) - 1)
    rnd = U32(iks_round_constant(bits, l))
    x = jnp.asarray(x, U32)
    u = x + rnd
    shifts = jnp.array([32 - bits * (i + 1) for i in range(l)], U32)
    return (u[..., None] >> shifts) & digit_mask


def decompose_unsigned(x, params: TFHEParams) -> jnp.ndarray:
    """Key-switch decomposition (tlwe.rs:48-63): (...,) -> (..., iks_l) uint32."""
    return decompose_unsigned_custom(x, params.iks_basebit, params.iks_l)


def recompose_signed(digits, params: TFHEParams) -> jnp.ndarray:
    """Test helper: sum_i d_i * 2^(32-bits*(i+1)) mod 2^32."""
    bits = params.bgbit
    d = jnp.asarray(digits, I32).astype(U32)
    weights = jnp.array(
        [(1 << (32 - bits * (i + 1))) & 0xFFFFFFFF for i in range(params.l)], U32
    )
    return jnp.sum(d * weights, axis=-1, dtype=U32)
