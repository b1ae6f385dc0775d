"""Circuit tests: levelization, plain evaluation, and the 8-bit encrypted
ripple-carry adder (BASELINE.json config 4) against plaintext addition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustfhe_tpu.apps.circuits import (
    Circuit,
    evaluate_encrypted,
    evaluate_plain,
    ripple_carry_adder,
)
from rustfhe_tpu.context import TFHE
from rustfhe_tpu.params import TEST_PARAMS

U32 = jnp.uint32


def test_adder_plain_exhaustive_4bit():
    c = ripple_carry_adder(4)
    for a in range(16):
        for b in range(16):
            bits = np.array(
                [(a >> i) & 1 for i in range(4)] + [(b >> i) & 1 for i in range(4)]
            )
            out = evaluate_plain(c, bits)
            total = sum(int(out[i]) << i for i in range(5))
            assert total == a + b, (a, b, total)


def test_levelize_depth():
    c = ripple_carry_adder(8)
    # ripple depth grows linearly with bits; sanity bounds.
    assert 8 <= c.depth <= 3 * 8
    layers = c.levelize()
    assert sum(len(l) for l in layers) == len(c.gates)


@pytest.fixture(scope="module")
def ctx():
    return TFHE.new(jax.random.PRNGKey(33), TEST_PARAMS, "matmul")


def test_encrypted_adder_8bit(ctx):
    c = ripple_carry_adder(8)
    cases = [(0, 0), (1, 1), (170, 85), (255, 255), (200, 100)]
    for a, b in cases:
        bits = np.array(
            [(a >> i) & 1 for i in range(8)] + [(b >> i) & 1 for i in range(8)],
            dtype=np.uint32,
        )
        cts = ctx.encrypt(jnp.asarray(bits))
        out = evaluate_encrypted(c, ctx, cts)
        dec = np.asarray(ctx.decrypt(out))
        total = sum(int(dec[i]) << i for i in range(9))
        assert total == a + b, (a, b, total)


def test_encrypted_mux_gate(ctx):
    c = Circuit(n_inputs=3)
    c.outputs = [c.mux(0, 1, 2)]
    for control, i0, i1 in [(0, 0, 1), (1, 0, 1), (0, 1, 0), (1, 1, 0)]:
        bits = jnp.array([control, i0, i1], U32)
        cts = ctx.encrypt(bits)
        out = evaluate_encrypted(c, ctx, cts)
        got = int(np.asarray(ctx.decrypt(out))[0])
        assert got == (i1 if control else i0)


def test_encrypted_leading_batch_axis(ctx):
    # Extra leading batch axes evaluate the whole batch per gate.
    c = ripple_carry_adder(2)
    pairs = [(0, 3), (1, 1), (2, 3), (3, 3)]
    bits = np.array(
        [[(a >> i) & 1 for i in range(2)] + [(b >> i) & 1 for i in range(2)]
         for a, b in pairs],
        dtype=np.uint32,
    )  # (4, 4)
    cts = ctx.encrypt(jnp.asarray(bits))  # (4, 4, n+1)
    out = evaluate_encrypted(c, ctx, cts)
    dec = np.asarray(ctx.decrypt(out))  # (4, 3)
    for row, (a, b) in enumerate(pairs):
        total = sum(int(dec[row, i]) << i for i in range(3))
        assert total == a + b, (a, b, total)


def test_large_circuit_1k_gates(ctx):
    """>=1k-gate circuit through the level-fused evaluator: 32 independent
    8-bit adders laid out side by side (wide levels, one fused bootstrap per
    level regardless of the op mix)."""
    n_add = 32
    single = ripple_carry_adder(8)
    c = Circuit(n_inputs=16 * n_add)
    rs = np.random.RandomState(9)
    vals = rs.randint(0, 256, size=(n_add, 2))
    # Replicate the adder topology with shifted wire indices.
    outputs = []
    for k in range(n_add):
        remap = {w: 16 * k + w for w in range(16)}
        for g in single.gates:
            ins = tuple(remap[w] for w in g.inputs)
            remap[g.output] = c.add(g.op, *ins)
        outputs += [remap[w] for w in single.outputs]
    c.outputs = outputs
    assert len(c.gates) >= 1000

    bits = np.zeros(16 * n_add, np.uint32)
    for k, (a, b) in enumerate(vals):
        for i in range(8):
            bits[16 * k + i] = (a >> i) & 1
            bits[16 * k + 8 + i] = (b >> i) & 1
    # Plain evaluator agrees with integer addition.
    plain = evaluate_plain(c, bits)
    cts = ctx.encrypt(jnp.asarray(bits))
    out = evaluate_encrypted(c, ctx, cts)
    dec = np.asarray(ctx.decrypt(out))
    assert np.array_equal(dec, plain)
    for k, (a, b) in enumerate(vals):
        total = sum(int(dec[9 * k + i]) << i for i in range(9))
        assert total == a + b, (k, a, b, total)
