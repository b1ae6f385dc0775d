"""Gate bootstrapping: blind rotation, sample extraction, key switch.

The hot path (SURVEY.md §3.2).  TPU design decisions:

* Blind rotation is a ``jax.lax.scan`` over the n sequential CMux steps
  (the fold at reference ``hom_nand/src/tfhe.rs:103-110``), with the whole
  batch of gates vectorized inside each step — the parallel axis is the
  batch, the n-step chain is inherently sequential (data dependence through
  the accumulator).
* The entire bootstrap is one jit region: the reference crosses the
  Rust->C++ FFI boundary 8x per CMux; here there are zero host round trips.
* Per-sample rotation amounts (each gate in the batch has its own a~_i) are
  applied gather-free (``poly.rotate_binary``: log2(2N) static negacyclic
  rolls + selects — dynamic gathers serialize on the TPU scalar core), or
  fully inside the engine's fused step kernel when it provides one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import poly, tlwe, trgsw, trlwe
from .decomp import decompose_unsigned
from .keys import CloudKey
from .params import TFHEParams

U32 = jnp.uint32
I32 = jnp.int32


def blind_rotate(ct, bk_prepared, testvec, params: TFHEParams, engine) -> jnp.ndarray:
    """Rotate ``testvec`` by the (encrypted) phase of ``ct``.

    ct: uint32 (..., n+1) lv0 TLWE; testvec: uint32 (..., 2, N) TRLWE
    (broadcastable); returns uint32 (..., 2, N).

    Scaling matches tfhe.rs:89-113 exactly:
      b~   = b >> (32 - nbit - 1)                 (floor, tfhe.rs:97)
      a~_i = (a_i + 2^(32-nbit-2)) >> (32-nbit-1)  (round, tfhe.rs:108)
      acc  = X^{-b~} * testvec; acc = CMux(bk_i, X^{a~_i} * acc, acc)
    """
    nbit = params.nbit
    shift = 32 - nbit - 1
    two_n = 2 * params.N
    b = tlwe.body(ct)  # (...,)
    a = tlwe.mask(ct)  # (..., n)
    b_tilde = (b >> U32(shift)).astype(I32)
    a_tilde = ((a + U32(1 << (shift - 1))) >> U32(shift)).astype(I32)

    # X^{-b~}: reduce to [0, 2N) for the gather-free binary rotation.
    neg_b = jnp.mod(-b_tilde, two_n)
    acc = poly.rotate_binary(testvec, neg_b[..., None])  # (..., 2, N)

    # scan over the n key bits; batch stays inside the step.
    a_steps = jnp.moveaxis(a_tilde, -1, 0)  # (n, ...)

    # Engines may keep the scan carry in a private layout (e.g. the
    # Karatsuba engine's even/odd split) — one conversion at entry/exit.
    enter = getattr(engine, "scan_enter", None)
    if enter is not None:
        acc = enter(acc, params)

    from .keys import HybridBK

    # Latency fast path: a panel-form key + small batch runs the WHOLE
    # rotation as one kernel launch with pipelined panel DMA
    # (engine.rotate_all_steps; returns None when inapplicable).
    if not isinstance(bk_prepared, HybridBK):
        ra = getattr(engine, "rotate_all_steps", None)
        if ra is not None:
            full = ra(bk_prepared, acc, a_steps, params)
            if full is not None:
                exit_ = getattr(engine, "scan_exit", None)
                return exit_(full, params) if exit_ is not None else full

    if isinstance(bk_prepared, HybridBK):
        # Hybrid mode (keys.cloud_key_hybrid): 2-step fused pairs with the
        # odd step's panel table prebuilt, then the standard tail.
        hb = bk_prepared
        npairs = hb.prep_even.shape[0]
        a_pairs = a_steps[: 2 * npairs].reshape(
            (npairs, 2) + a_steps.shape[1:]
        )

        def pair_step(acc, xs):
            prep_e, pan_o, a2 = xs
            return engine.cmux_step_pair(prep_e, pan_o, acc, a2, params), None

        acc, _ = jax.lax.scan(
            pair_step, acc, (hb.prep_even, hb.panels_odd, a_pairs)
        )
        if hb.prep_tail.shape[0]:
            def tail_step(acc, xs):
                bk_i, a_i = xs
                return engine.cmux_step(bk_i, acc, a_i, params), None

            acc, _ = jax.lax.scan(
                tail_step, acc, (hb.prep_tail, a_steps[2 * npairs :])
            )
    elif getattr(engine, "fuse_step", False):
        # Engine provides the whole CMux step as one fused kernel.
        def step(acc, xs):
            bk_i, a_i = xs
            return engine.cmux_step(bk_i, acc, a_i, params), None

        acc, _ = jax.lax.scan(step, acc, (bk_prepared, a_steps))
    else:
        def step(acc, xs):
            bk_i, a_i = xs
            rotated = poly.rotate_binary(acc, a_i[..., None])
            diff = (rotated - acc).astype(U32)
            digits = trgsw.decompose_trlwe(diff, params)
            cross = engine.external_product_digits(bk_i, digits, params)
            return (acc + cross).astype(U32), None

        acc, _ = jax.lax.scan(step, acc, (bk_prepared, a_steps))

    exit_ = getattr(engine, "scan_exit", None)
    if exit_ is not None:
        acc = exit_(acc, params)
    return acc


def gate_bootstrapping_tlwe2tlwe(ct, bk_prepared, params: TFHEParams, engine) -> jnp.ndarray:
    """lv0 TLWE -> lv1 TLWE encrypting mu * sign (tfhe.rs:81-88)."""
    mu = U32(params.mu)
    testvec = trlwe.trivial(jnp.full((params.N,), mu, U32))  # (2, N)
    rotated = blind_rotate(ct, bk_prepared, testvec, params, engine)
    return trlwe.sample_extract(rotated, 0)


def identity_key_switch(ct_lv1, ksk_prepared, params: TFHEParams, engine) -> jnp.ndarray:
    """lv1 TLWE (..., N+1) -> lv0 TLWE (..., n+1) (tlwe.rs:43-73)."""
    b = tlwe.body(ct_lv1)
    a = tlwe.mask(ct_lv1)  # (..., N)
    digits = decompose_unsigned(a, params)  # (..., N, iks_l)
    contrib = engine.key_switch_digits(ksk_prepared, digits, params)
    return (tlwe.trivial(b, params.n) - contrib).astype(U32)


def bootstrap(ct, ck: CloudKey, params: TFHEParams, engine) -> jnp.ndarray:
    """Full gate bootstrap: blind rotate + extract + key switch (tfhe.rs:73-80)."""
    lv1 = gate_bootstrapping_tlwe2tlwe(ct, ck.bk, params, engine)
    return identity_key_switch(lv1, ck.ksk, params, engine)
