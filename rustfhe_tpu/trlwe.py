"""TRLWE (ring LWE over the torus), batched.

Layout decision (SURVEY.md §7): a batch of TRLWE ciphertexts is ONE uint32
array of shape ``(..., 2, N)`` — index 0 on the pair axis is the body
polynomial ``b`` (the reference's ``cipher``) and index 1 the mask ``a``
(``p_key``); reference struct at ``hom_nand/src/trlwe.rs:20-23``.

The body is computed with the exact integer engine
(``b = a (*) s + m + e``, trlwe.rs:127-137) instead of the reference's
approximate f64 ``fft_cross``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import torus
from .params import TFHEParams
from .utils.rng import gaussian_torus, uniform_torus

U32 = jnp.uint32


def trivial(msg: jnp.ndarray) -> jnp.ndarray:
    """Noiseless ciphertext (m, 0) (trlwe.rs:45-47). msg: (..., N)."""
    msg = jnp.asarray(msg, U32)
    return jnp.stack([msg, jnp.zeros_like(msg)], axis=-2)


def encrypt_torus_poly(key, s: jnp.ndarray, m, params: TFHEParams, engine) -> jnp.ndarray:
    """Encrypt torus polynomial(s) ``m (..., N)`` under binary poly key ``s (N,)``."""
    m = jnp.asarray(m, U32)
    ka, ke = jax.random.split(key)
    a = uniform_torus(ka, m.shape)
    e = gaussian_torus(ke, m.shape, params.alpha_lv1)
    b = engine.poly_mul_torus_binary(a, s, params) + m + e
    return jnp.stack([b, a], axis=-2)


def phase(ct, s: jnp.ndarray, params: TFHEParams, engine) -> jnp.ndarray:
    """b - a (*) s (trlwe.rs:139-147). ct: (..., 2, N) -> (..., N)."""
    ct = jnp.asarray(ct, U32)
    return ct[..., 0, :] - engine.poly_mul_torus_binary(ct[..., 1, :], s, params)


def encrypt_binary_poly(key, s, bits, params: TFHEParams, engine) -> jnp.ndarray:
    """bits: (..., N) in {0,1} -> +-1/8 encoding (trlwe.rs:78-88)."""
    return encrypt_torus_poly(key, s, torus.binary_to_torus(bits), params, engine)


def decrypt_binary_poly(ct, s, params: TFHEParams, engine) -> jnp.ndarray:
    return torus.torus_to_binary(phase(ct, s, params, engine))


def sample_extract(ct, index) -> jnp.ndarray:
    """Extract the TLWE ciphertext of coefficient ``index`` (trlwe.rs:105-122).

    ct: (..., 2, N) -> TLWE (..., N+1):
      b' = b[index];  a'_i = a[index-i] if i <= index else -a[N+index-i].
    ``index`` may be a Python int or a traced scalar.
    """
    ct = jnp.asarray(ct, U32)
    N = ct.shape[-1]
    b_poly = ct[..., 0, :]
    a_poly = ct[..., 1, :]
    i = jnp.arange(N)
    k = jnp.mod(jnp.asarray(index) - i, 2 * N)  # (N,)
    neg_mask = k >= N
    k = jnp.where(neg_mask, k - N, k)
    gathered = jnp.take(a_poly, k, axis=-1)
    a_prime = jnp.where(neg_mask, (~gathered + U32(1)).astype(U32), gathered)
    b_prime = jnp.take(b_poly, jnp.asarray(index)[None], axis=-1)
    return jnp.concatenate([b_prime, a_prime], axis=-1)
