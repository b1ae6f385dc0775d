"""Deterministic random sampling of torus values.

Replaces the reference's unseeded ``thread_rng`` distributions
(``ModDistribution``/``BinaryDistribution``, ``utils/src/math.rs:399-479``)
with counter-based ``jax.random`` — every key, ciphertext and noise sample is
reproducible from a single PRNG key (SURVEY.md §7 design decision 6).

Deliberate improvement over the reference: uniform torus masks are sampled
with full 32-bit entropy (the reference samples an f32 uniform and quantizes
to ~2^24 distinct values, math.rs:425-432).  Gaussian noise keeps the
reference's encoding path: f32 sample -> fractional part -> scale by 2^32
(math.rs:691-696).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import torus

U32 = jnp.uint32


def uniform_torus(key, shape) -> jnp.ndarray:
    """Uniform Torus32: full-entropy 32 random bits."""
    return jax.random.bits(key, shape, U32)


def gaussian_torus(key, shape, std: float) -> jnp.ndarray:
    """Gaussian noise on the torus, mean 0, stddev ``std`` (math.rs:417-424)."""
    r = jax.random.normal(key, shape, jnp.float32) * jnp.float32(std)
    return torus.from_double(r)


def binary_array(key, shape) -> jnp.ndarray:
    """Uniform bits in {0,1} as uint32 (math.rs:462-479)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(U32)
