"""Naive exact engine: O(N^2) uint32 wrapping negacyclic convolution.

The ground-truth engine.  Mirrors the role of the reference's naive
``Polynomial::cross`` (``utils/src/math.rs:237-257``): every fast engine is
validated against this one, exactly as the reference validates ``fft_cross``
against ``cross`` (math.rs:904-952) — except here equality is *exact*
(integer mod 2^32), not within float tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..poly import negacyclic_mul_torus_oracle

U32 = jnp.uint32
I32 = jnp.int32


class OracleEngine:
    name = "oracle"

    def prepare_trgsw(self, rows, params):
        # No precomputation: the prepared form is the raw uint32 rows.
        return jnp.asarray(rows, U32)

    def external_product_digits(self, prepared, digits, params):
        # prepared: (2L, 2, N) u32; digits: (..., 2L, N) i32
        # out[..., c, :] = sum_j digits[..., j, :] (*) prepared[j, c, :]
        prods = negacyclic_mul_torus_oracle(
            prepared[:, :, :],  # (2L, 2, N)
            digits[..., :, None, :],  # (..., 2L, 1, N)
        )  # (..., 2L, 2, N)
        return jnp.sum(prods, axis=-3, dtype=U32)

    def poly_mul_torus_binary(self, a, s, params):
        return negacyclic_mul_torus_oracle(a, s)

    def prepare_ksk(self, ksk_raw, params):
        # (N, iks_l, T, n+1) raw; prepend a zero slot so digit value d
        # indexes directly (digit 0 contributes nothing, tlwe.rs:67-69).
        zeros = jnp.zeros(ksk_raw.shape[:2] + (1,) + ksk_raw.shape[3:], U32)
        return jnp.concatenate([zeros, jnp.asarray(ksk_raw, U32)], axis=2)

    def key_switch_digits(self, prepared, digits, params):
        # prepared: (N, L, T+1, n+1); digits: (..., N, L) in [0, T)
        # returns sum_{i,l} prepared[i, l, digits[..., i, l], :]
        i = jnp.arange(params.N)[:, None]
        l = jnp.arange(params.iks_l)[None, :]
        sel = prepared[i, l, digits.astype(jnp.int32)]  # (..., N, L, n+1)
        return jnp.sum(sel, axis=(-3, -2), dtype=U32)
