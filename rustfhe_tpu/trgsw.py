"""TRGSW scheme: gadget-decomposed ring-GSW ciphertexts, batched.

Layout: a TRGSW ciphertext is uint32 ``(..., 2L, 2, N)``: 2L rows, each a
TRLWE pair (body, mask).  Rows are 2L zero-encryptions with the gadget
added — row j < L gets m/Bg^(j+1) on the body, row L+j gets it on the mask
(reference ``hom_nand/src/trgsw.rs:118-158`` for polynomial messages,
``:217-229`` for scalars).

The external product / CMux live here conceptually but are routed through
the engine (``engine.external_product_digits``) after gadget decomposition
of the TRLWE operand (trgsw.rs:264-306, 315-330).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import trlwe
from .decomp import decompose_signed
from .params import TFHEParams
from .utils.rng import gaussian_torus, uniform_torus

U32 = jnp.uint32
I32 = jnp.int32


def _zero_rows(key, s: jnp.ndarray, batch_shape, params: TFHEParams, engine) -> jnp.ndarray:
    """(batch..., 2L, 2, N) zero TRLWE encryptions (trgsw.rs:118-139)."""
    N = params.N
    two_l = 2 * params.l
    ka, ke = jax.random.split(key)
    shape = tuple(batch_shape) + (two_l, N)
    a = uniform_torus(ka, shape)
    e = gaussian_torus(ke, shape, params.alpha_lv1)
    b = engine.poly_mul_torus_binary(a, s, params) + e
    return jnp.stack([b, a], axis=-2)  # (..., 2L, 2, N)


def _gadget_values(item_int: jnp.ndarray, params: TFHEParams) -> jnp.ndarray:
    """m/Bg^(j+1) on the torus for j < L: exact m * 2^(32 - bgbit*(j+1)).

    item_int: int32 (...,); returns uint32 (..., L).
    """
    shifts = jnp.array(
        [(32 - params.bgbit * (j + 1)) for j in range(params.l)], U32
    )
    v = jnp.asarray(item_int, I32).astype(U32)
    return (v[..., None] << shifts).astype(U32)


def encrypt_int_poly(key, s, item, params: TFHEParams, engine) -> jnp.ndarray:
    """Encrypt integer polynomial(s) ``item (..., N)`` (trgsw.rs:145-158)."""
    item = jnp.asarray(item, I32)
    batch_shape = item.shape[:-1]
    rows = _zero_rows(key, s, batch_shape, params, engine)
    g = _gadget_values(item, params)  # (..., N, L)
    g = jnp.moveaxis(g, -1, -2)  # (..., L, N)
    l = params.l
    rows = rows.at[..., :l, 0, :].add(g)
    rows = rows.at[..., l:, 1, :].add(g)
    return rows


def encrypt_int(key, s, item, params: TFHEParams, engine) -> jnp.ndarray:
    """Encrypt scalar integer(s) ``item (...,)`` on the constant term
    (trgsw.rs:217-229)."""
    item = jnp.asarray(item, I32)
    item_poly = jnp.zeros(item.shape + (params.N,), I32).at[..., 0].set(item)
    return encrypt_int_poly(key, s, item_poly, params, engine)


def _round_phase_to_digit(ph, params: TFHEParams) -> jnp.ndarray:
    """round(phase * Bg) as EXACT integer arithmetic: the phase encodes
    m/Bg = m * 2^(32-bgbit), so m = (ph + 2^(31-bgbit)) >> (32-bgbit)
    (round-half-up), then map to the balanced range (-Bg/2, Bg/2].
    (The float32 path this replaces silently loses low bits for Bg > 2^8.)"""
    bg = params.bg
    shift = 32 - params.bgbit
    half = jnp.uint32(1 << (shift - 1))
    m = ((jnp.asarray(ph, U32) + half) >> jnp.uint32(shift)).astype(I32) & (bg - 1)
    return jnp.where(m > bg // 2, m - bg, m)


def decrypt_int_poly(rep, s, params: TFHEParams, engine) -> jnp.ndarray:
    """Read row 0 as a TRLWE of m/Bg and round (trgsw.rs:160-177)."""
    row0 = rep[..., 0, :, :]  # (..., 2, N)
    ph = trlwe.phase(row0, s, params, engine)  # (..., N) torus of m/Bg
    return _round_phase_to_digit(ph, params)


def decrypt_int(rep, s, params: TFHEParams, engine) -> jnp.ndarray:
    """Scalar decrypt via sample-extract of row 0 (trgsw.rs:231-248)."""
    row0 = rep[..., 0, :, :]
    t = trlwe.sample_extract(row0, 0)  # (..., N+1)
    from . import tlwe  # local import to avoid cycle

    ph = tlwe.phase(t, s)
    return _round_phase_to_digit(ph, params)


def encrypt_uint_poly(key, s, item, params: TFHEParams, engine) -> jnp.ndarray:
    """Polynomial<u32> item type (trgsw.rs:179-191): routed through i32."""
    return encrypt_int_poly(key, s, jnp.asarray(item).astype(I32), params, engine)


def decrypt_uint_poly(rep, s, params: TFHEParams, engine) -> jnp.ndarray:
    return decrypt_int_poly(rep, s, params, engine).astype(U32)


def encrypt_binary_poly(key, s, bits, params: TFHEParams, engine) -> jnp.ndarray:
    """Polynomial<Binary> item type (trgsw.rs:192-211)."""
    return encrypt_int_poly(key, s, jnp.asarray(bits).astype(I32), params, engine)


def decrypt_binary_poly(rep, s, params: TFHEParams, engine) -> jnp.ndarray:
    return (decrypt_int_poly(rep, s, params, engine) != 0).astype(U32)


def encrypt_binary(key, s, bit, params: TFHEParams, engine) -> jnp.ndarray:
    """Scalar Binary item type (trgsw.rs:250-262)."""
    return encrypt_int(key, s, jnp.asarray(bit).astype(I32), params, engine)


def decrypt_binary(rep, s, params: TFHEParams, engine) -> jnp.ndarray:
    return (decrypt_int(rep, s, params, engine) != 0).astype(U32)


def decompose_trlwe(ct, params: TFHEParams) -> jnp.ndarray:
    """Gadget-decompose a TRLWE pair into the 2L digit polynomials.

    ct: (..., 2, N) -> int32 (..., 2L, N), ordered body digits then mask
    digits (matching the row order b_decomp ++ a_decomp, trgsw.rs:289-299).
    """
    digits = decompose_signed(ct, params)  # (..., 2, N, L)
    digits = jnp.moveaxis(digits, -1, -2)  # (..., 2, L, N)
    shape = digits.shape[:-3] + (2 * params.l, params.N)
    return digits.reshape(shape)


def external_product(prepared, ct, params: TFHEParams, engine) -> jnp.ndarray:
    """prepared TRGSW x TRLWE -> TRLWE (trgsw.rs:264-306)."""
    return engine.external_product_digits(prepared, decompose_trlwe(ct, params), params)


def cmux(prepared, ct1, ct0, params: TFHEParams, engine) -> jnp.ndarray:
    """TRGSW(bit).cmux(ct1, ct0) = cross(ct1 - ct0) + ct0 (trgsw.rs:315-330)."""
    diff = (jnp.asarray(ct1, U32) - jnp.asarray(ct0, U32)).astype(U32)
    return ct0 + external_product(prepared, diff, params, engine)
