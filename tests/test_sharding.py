"""Multi-device tests on the 8-virtual-CPU-device mesh: sharded evaluation
must agree exactly with the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustfhe_tpu import gates, keys, tlwe
from rustfhe_tpu.parallel import make_mesh, shard_cloud_key, sharded_gate_fn
from rustfhe_tpu.params import TEST_PARAMS

U32 = jnp.uint32


@pytest.fixture(scope="module")
def setup():
    p = TEST_PARAMS
    key = jax.random.PRNGKey(3)
    kg, ke = jax.random.split(key)
    sk, ck = keys.gen_keys(kg, p, engine_name="matmul")
    B = 16
    bits_x = jax.random.bernoulli(jax.random.fold_in(ke, 0), 0.5, (B,)).astype(U32)
    bits_y = jax.random.bernoulli(jax.random.fold_in(ke, 1), 0.5, (B,)).astype(U32)
    cx = tlwe.encrypt_binary(jax.random.fold_in(ke, 2), sk.lv0, bits_x, p)
    cy = tlwe.encrypt_binary(jax.random.fold_in(ke, 3), sk.lv0, bits_y, p)
    ref = gates.hom_nand(ck, cx, cy, params=p, engine_name="matmul")
    return p, sk, ck, cx, cy, ref, bits_x, bits_y


def test_device_count():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(setup, data, model):
    p, sk, ck, cx, cy, ref, bx, by = setup
    mesh = make_mesh(data=data, model=model)
    fn = sharded_gate_fn(mesh, p, "matmul")
    ck_sh = shard_cloud_key(ck, mesh)
    out = fn(ck_sh.bk, ck_sh.ksk, cx, cy)
    # Bit-exact agreement with the unsharded result: the whole pipeline is
    # integer arithmetic, so sharding must not change a single bit.
    assert np.array_equal(np.asarray(out), np.asarray(ref))
    dec = np.asarray(tlwe.decrypt_binary(out, sk.lv0))
    expect = 1 - (np.asarray(bx) & np.asarray(by))
    assert np.array_equal(dec, expect)
