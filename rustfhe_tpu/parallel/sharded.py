"""Mesh-sharded batched gate evaluation.

Replaces the reference's nonexistent parallelism (SURVEY.md §2.6) with the
TPU-native scale-out path:

* gate batch partitioned over the ``data`` axis (each device bootstraps its
  shard of the batch independently — no communication in the blind-rotate
  scan; this is the >=1M gates/s axis),
* key-switch table rows partitioned over the ``model`` axis, with each
  device accumulating its partial sum of KS[i,l,d] contributions and a
  ``psum`` over ICI producing the full switch (the collective analogue of
  the accumulation loop at reference ``tlwe.rs:65-72``).

Bootstrapping keys are replicated (62 MB at default parameters, well within
HBM — SURVEY.md §7 "Hard parts" 5).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import tlwe, trlwe
from ..bootstrap import blind_rotate
from ..decomp import decompose_unsigned
from ..engine import get_engine
from ..keys import CloudKey
from ..params import TFHEParams

U32 = jnp.uint32
I32 = jnp.int32
I8 = jnp.int8


def _key_switch_local(ct_lv1, ksk_local, params: TFHEParams, engine, axis_name: str):
    """Key switch with the KSK row-sharded over ``axis_name``.

    ksk_local: this device's contiguous row-shard of the prepared KSK
    (matmul engine layout: (Q_local, (n+1)*K) int8).  Builds the full
    one-hot, slices the local Q range, matmuls, and psums partial limbs.
    """
    b = tlwe.body(ct_lv1)
    a = tlwe.mask(ct_lv1)
    digits = decompose_unsigned(a, params)  # (..., N, iks_l)
    nslots = params.iks_t - 1
    t = jnp.arange(1, params.iks_t, dtype=I32)
    onehot = (digits.astype(I32)[..., None] == t).astype(I8)
    q_total = params.N * params.iks_l * nslots
    onehot = onehot.reshape(onehot.shape[:-3] + (q_total,))

    q_local = ksk_local.shape[0]
    start = jax.lax.axis_index(axis_name) * q_local
    local_onehot = jax.lax.dynamic_slice_in_dim(onehot, start, q_local, axis=-1)
    out = jnp.dot(local_onehot, ksk_local, preferred_element_type=I32)
    out = jax.lax.psum(out, axis_name)  # exact: integer partial sums
    K = engine.num_limbs
    out = out.reshape(out.shape[:-1] + (out.shape[-1] // K, K))
    acc = jnp.zeros(out.shape[:-1], U32)
    u = out.astype(U32)
    for k in range(K):
        acc = acc + (u[..., k] << U32(engine.limb_bits * k))
    return (tlwe.trivial(b, params.n) - acc).astype(U32)


def sharded_gate_fn(mesh: Mesh, params: TFHEParams, engine_name: str = "matmul"):
    """Build a jitted, mesh-sharded NAND over (CloudKey, x, y).

    The returned function expects the KSK pre-sharded over ``model`` rows
    and ciphertext batches sharded over ``data``; the bootstrapping key is
    replicated.  Returns outputs sharded over ``data``.
    """
    engine = get_engine(engine_name)

    def gate(bk, ksk, x, y):
        mu = jnp.asarray(params.mu, U32)
        pre = (tlwe.trivial(mu, params.n) - (x + y)).astype(U32)
        testvec = trlwe.trivial(jnp.full((params.N,), mu, U32))
        rotated = blind_rotate(pre, bk, testvec, params, engine)
        lv1 = trlwe.sample_extract(rotated, 0)
        return _key_switch_local(lv1, ksk, params, engine, "model")

    mapped = jax.shard_map(
        gate,
        mesh=mesh,
        in_specs=(P(), P("model"), P("data"), P("data")),
        out_specs=P("data"),
    )
    return jax.jit(mapped)


def shard_cloud_key(ck: CloudKey, mesh: Mesh):
    """Place BK replicated and KSK row-sharded over ``model``."""
    from jax.sharding import NamedSharding

    bk = jax.device_put(ck.bk, NamedSharding(mesh, P()))
    ksk = jax.device_put(ck.ksk, NamedSharding(mesh, P("model")))
    return CloudKey(bk=bk, ksk=ksk)
