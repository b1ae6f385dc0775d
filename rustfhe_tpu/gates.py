"""Bootstrapped homomorphic gates, batched.

The six gate formulas are the reference's linear pre-combinations followed
by a bootstrap (``hom_nand/src/tfhe.rs:27-71``):

  NAND: mu - (x + y)        AND: (x + y) - mu       OR:  (x + y) + mu
  XOR:  2(x + y) + 2mu      NOT: -x                 MUX: and/and/or (3 bootstraps)

All gates operate on batches: inputs of shape ``(..., n+1)`` produce outputs
of the same shape, with every ciphertext in the batch bootstrapped in the
same fused device program.  ``jit_gate`` returns a jit-compiled gate closure
for a fixed (params, engine) pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import tlwe
from .bootstrap import bootstrap
from .engine import resolve_engine
from .keys import CloudKey
from .params import TFHEParams

U32 = jnp.uint32


def _mu_trivial(params: TFHEParams, shape=()):
    return tlwe.trivial(jnp.full(shape, params.mu, U32), params.n)


@partial(jax.jit, static_argnames=("params", "engine_name"))
def hom_bootstrap(ck: CloudKey, pre, *, params: TFHEParams, engine_name="matmul"):
    """Bootstrap an already-precombined batch (the shared second half of
    every gate formula, tfhe.rs:73-80).  Lets callers fuse arbitrary gate
    mixes into one bootstrap (see apps/circuits.evaluate_encrypted)."""
    engine = resolve_engine(engine_name)
    return bootstrap(jnp.asarray(pre, U32), ck, params, engine)


@partial(jax.jit, static_argnames=("params", "engine_name"))
def hom_nand(ck: CloudKey, x, y, *, params: TFHEParams, engine_name="matmul"):
    engine = resolve_engine(engine_name)
    pre = (_mu_trivial(params) - (x + y)).astype(U32)
    return bootstrap(pre, ck, params, engine)


@partial(jax.jit, static_argnames=("params", "engine_name"))
def hom_and(ck: CloudKey, x, y, *, params: TFHEParams, engine_name="matmul"):
    engine = resolve_engine(engine_name)
    pre = ((x + y) - _mu_trivial(params)).astype(U32)
    return bootstrap(pre, ck, params, engine)


@partial(jax.jit, static_argnames=("params", "engine_name"))
def hom_or(ck: CloudKey, x, y, *, params: TFHEParams, engine_name="matmul"):
    engine = resolve_engine(engine_name)
    pre = ((x + y) + _mu_trivial(params)).astype(U32)
    return bootstrap(pre, ck, params, engine)


@partial(jax.jit, static_argnames=("params", "engine_name"))
def hom_xor(ck: CloudKey, x, y, *, params: TFHEParams, engine_name="matmul"):
    engine = resolve_engine(engine_name)
    two_mu = tlwe.trivial(jnp.asarray(2 * params.mu & 0xFFFFFFFF, U32), params.n)
    pre = ((x + y) * U32(2) + two_mu).astype(U32)
    return bootstrap(pre, ck, params, engine)


@partial(jax.jit, static_argnames=("params", "engine_name"))
def hom_not(ck: CloudKey, x, *, params: TFHEParams, engine_name="matmul"):
    engine = resolve_engine(engine_name)
    return bootstrap(tlwe.neg(x), ck, params, engine)


@partial(jax.jit, static_argnames=("params", "engine_name"))
def hom_mux(ck: CloudKey, control, in0, in1, *, params: TFHEParams, engine_name="matmul"):
    """(in1 & control) | (in0 & !control), 3 bootstraps (tfhe.rs:27-40).

    The two ANDs are independent, so they are fused into ONE double-width
    bootstrap batch (stacked on a new leading axis) — a mux costs two
    bootstrap passes of latency, not three.
    """
    engine = resolve_engine(engine_name)
    mu = _mu_trivial(params)
    pre_a = ((control + in1) - mu).astype(U32)
    pre_b = ((tlwe.neg(control) + in0) - mu).astype(U32)
    both = bootstrap(jnp.stack([pre_a, pre_b]), ck, params, engine)
    i1, i0 = both[0], both[1]
    pre = (i1 + i0 + mu).astype(U32)
    return bootstrap(pre, ck, params, engine)


GATES_2IN = {"nand": hom_nand, "and": hom_and, "or": hom_or, "xor": hom_xor}

# Linear pre-combination coefficients (ca, cb, c_mu): pre = ca*x + cb*y +
# c_mu*mu*e_0, the first half of every gate formula (tfhe.rs:27-71).
# "andn" is and(!x, y), the mux first-pass helper (tfhe.rs:29-33).
PRE_COEFFS = {
    "nand": (-1, -1, 1),
    "and": (1, 1, -1),
    "or": (1, 1, 1),
    "xor": (2, 2, 2),
    "not": (-1, 0, 0),
    "andn": (-1, 1, -1),
}


def precombine(op: str, x, y=None, *, params: TFHEParams):
    """Linear gate pre-combination, evaluated EAGERLY (outside any jit).

    Pairing this with the shared ``hom_bootstrap`` program means every gate
    op reuses ONE compiled 635-step scan per batch shape — the per-op
    ``hom_*`` wrappers each compile their own.  The pre-combination is 2-3
    vector ops (<0.1% of a bootstrap), so eager dispatch costs nothing;
    avoiding three extra multi-minute remote compiles on first use is the
    point (see apps/nander.FheLogic, apps/circuits.evaluate_encrypted).
    """
    ca, cb, cm = PRE_COEFFS[op]
    pre = (jnp.asarray(x, U32) * U32(ca & 0xFFFFFFFF)).astype(U32)
    if cb:
        pre = (pre + jnp.asarray(y, U32) * U32(cb & 0xFFFFFFFF)).astype(U32)
    if cm:
        pre = pre.at[..., 0].add(U32((cm * params.mu) & 0xFFFFFFFF))
    return pre
