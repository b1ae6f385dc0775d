"""Torus32 arithmetic on uint32 JAX arrays.

The reference represents torus elements T = R/Z as 32-bit fixed point with
wraparound (``Decimal<u32>``, ``utils/src/math.rs:489-539``).  JAX uint32
arithmetic wraps mod 2^32 by definition, so Torus32 here is simply
``jnp.uint32`` arrays; this module holds the codec and encoding helpers.

Encodings (bit-exact with the reference):
  * float -> torus:  ``(frac(x) * 2^32) as u32``  (math.rs:691-702; the f32
    constant ``u32::MAX as f32`` rounds to 2^32 exactly, and Rust float->int
    casts truncate toward zero and saturate).
  * Binary message: One -> +1/8 = 0x2000_0000, Zero -> -1/8 = 0xE000_0000
    (tlwe.rs:181-186).
  * Decode: interpret as fraction in [0,1); f < 0.5 -> One else Zero
    (tlwe.rs:187-195).  Equivalently: u < 0x8000_0000 -> One.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32

TORUS_ONE_EIGHTH = np.uint32(0x20000000)  # +1/8
TORUS_MINUS_ONE_EIGHTH = np.uint32(0xE0000000)  # -1/8


def from_double(x) -> jnp.ndarray:
    """Encode float(s) in R to Torus32: frac(x) scaled by 2^32.

    Matches ``impl From<f64> for Decimal<u32>`` (math.rs:697-702): take the
    fractional part, multiply by 2^32, truncate toward zero, saturate.
    Computed in float64 on host/CPU paths; the hot device paths never use it.
    """
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    # (x - floor(x)).fract(): the second fract matters for tiny negative x,
    # where x - floor(x) rounds to exactly 1.0 -> fract() gives 0.0.
    frac = x - jnp.floor(x)
    frac = frac - jnp.floor(frac)
    frac = jnp.where(frac >= 1.0, 0.0, frac)
    scaled = frac * jnp.asarray(4294967296.0, frac.dtype)
    return scaled.astype(U32)


def to_double(t) -> jnp.ndarray:
    """Decode Torus32 to float in [0,1) (math.rs:674-678 semantics)."""
    return jnp.asarray(t, U32).astype(jnp.float64) / 4294967296.0


def binary_to_torus(b) -> jnp.ndarray:
    """Binary {0,1} -> Torus32 message +-1/8 (tlwe.rs:181-186)."""
    b = jnp.asarray(b)
    return jnp.where(b != 0, U32(TORUS_ONE_EIGHTH), U32(TORUS_MINUS_ONE_EIGHTH))


def torus_to_binary(t) -> jnp.ndarray:
    """Torus32 -> Binary {0,1}: fraction < 0.5 decodes to One (tlwe.rs:187-195)."""
    t = jnp.asarray(t, U32)
    return (t < U32(0x80000000)).astype(U32)


def signed_to_torus(v, shift: int) -> jnp.ndarray:
    """Exact encoding v * 2^(32-shift) mod 2^32 for small integers v.

    Used for gadget constants m/Bg^(i+1) (trgsw.rs:150-156) and key-switch
    messages t*s_i/2^(basebit*(l+1)) (tlwe.rs:252-258), which the reference
    computes through f32 but which are exact powers of two times a tiny
    integer, hence identical when computed directly in integers.
    """
    v = jnp.asarray(v, U32)
    if shift >= 32:
        return jnp.zeros_like(v)
    return (v << U32(32 - shift)).astype(U32)


def pow_two_minus(k: int) -> np.uint32:
    """Torus value 2^-k (math.rs:630-637)."""
    if k == 0:
        return np.uint32(0)
    k = min(k, 32)
    return np.uint32((1 << (32 - k)) & 0xFFFFFFFF)


def is_in(a, b, radius_pow: int = 10) -> jnp.ndarray:
    """Wrapping approximate equality on the torus circle: True where the
    circular distance |a - b| (mod 1) is below 2^-radius_pow.

    Covers the role of ``Decimal::is_in`` (math.rs:617-621) but intentionally
    STRENGTHENS its semantics: the reference compares non-wrapping f32
    |a - b| < acc, which misjudges pairs straddling the 0/1 wrap point;
    this version measures true circular distance (with a power-of-two
    radius), the correct torus metric.  Used for noise-tolerant comparisons
    in probabilistic tests."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    d = (a - b).astype(U32)
    dist = jnp.minimum(d, (-d).astype(U32))  # min(d, 2^32 - d)
    return dist < pow_two_minus(radius_pow)
