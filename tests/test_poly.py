"""Negacyclic polynomial op tests: rotate golden vectors
(``utils/src/math.rs:75-84,894-903``), naive-product hand values
(math.rs:725-864 flavor), and engine-vs-oracle exact equivalence — the
analogue of the reference's fft_cross-vs-cross test (math.rs:904-952)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustfhe_tpu import poly
from rustfhe_tpu.engine import get_engine
from rustfhe_tpu.params import TFHEParams

U32 = jnp.uint32
I32 = jnp.int32


def test_rotate_golden():
    p = jnp.array([1, 2, 3, 4, 5], I32)
    cases = {
        1: [-5, 1, 2, 3, 4],
        3: [-3, -4, -5, 1, 2],
        -1: [2, 3, 4, 5, -1],
        -3: [4, 5, -1, -2, -3],
        5: [-1, -2, -3, -4, -5],
        -4: [5, -1, -2, -3, -4],
        10: [1, 2, 3, 4, 5],
    }
    for n, expect in cases.items():
        got = list(np.asarray(poly.rotate(p, n)))
        assert got == expect, (n, got, expect)
    # rotate(-8) == rotate(2) (math.rs:82)
    assert np.array_equal(np.asarray(poly.rotate(p, -8)), np.asarray(poly.rotate(p, 2)))


def test_rotate_batched_per_item():
    rs = np.random.RandomState(0)
    p = jnp.asarray(rs.randint(0, 2**32, size=(8, 16), dtype=np.uint64).astype(np.uint32))
    ns = jnp.array([0, 1, 5, 16, 17, 31, 32, 3], I32)
    out = poly.rotate(p, ns)
    for b in range(8):
        single = poly.rotate(p[b], int(ns[b]))
        assert np.array_equal(np.asarray(out[b]), np.asarray(single))


def test_rotate_uint_wraps_sign():
    # negation of unsigned coefficients must be mod-2^32 two's complement.
    p = jnp.array([1, 0, 0, 0], U32)
    out = np.asarray(poly.rotate(p, 4))  # X^N * p == -p
    assert out[0] == 0xFFFFFFFF


def test_naive_negacyclic_hand_values():
    # (1 + 2X)(3 + 4X) over Z[X]/(X^2+1) = 3 + 10X + 8X^2 = -5 + 10X
    a = jnp.array([1, 2], I32)
    b = jnp.array([3, 4], I32)
    got = list(poly.negacyclic_mul_i64(np.asarray(a), np.asarray(b)))
    assert got == [-5, 10]
    # X * X == -1 at N=2
    a = jnp.array([0, 1], I32)
    got = list(poly.negacyclic_mul_i64(np.asarray(a), np.asarray(a)))
    assert got == [-1, 0]


def test_torus_oracle_matches_i64_mod32():
    rs = np.random.RandomState(1)
    N = 32
    a = rs.randint(0, 2**32, size=(N,), dtype=np.uint64).astype(np.uint32)
    b = rs.randint(-32, 32, size=(N,)).astype(np.int32)
    got = np.asarray(poly.negacyclic_mul_torus_oracle(jnp.asarray(a), jnp.asarray(b)))
    exact = poly.negacyclic_mul_i64(a.astype(np.int64), b)
    assert np.array_equal(got, (exact % (1 << 32)).astype(np.uint32))


def test_signed_limbs_round_trip():
    rs = np.random.RandomState(2)
    xs = jnp.asarray(rs.randint(0, 2**32, size=(1000,), dtype=np.uint64).astype(np.uint32))
    for bits in (8, 4):
        limbs = poly.to_signed_limbs(xs, bits, 32 // bits)
        assert int(jnp.max(jnp.abs(limbs.astype(I32)))) <= 1 << (bits - 1)
        back = poly.from_signed_limbs(limbs, bits)
        assert np.array_equal(np.asarray(back), np.asarray(xs))


@pytest.mark.parametrize("engine_name", ["matmul", "matmul_bf16"])
def test_poly_mul_engine_vs_oracle(engine_name):
    params = TFHEParams(n=16, N=64)
    eng = get_engine(engine_name)
    oracle = get_engine("oracle")
    rs = np.random.RandomState(3)
    a = jnp.asarray(rs.randint(0, 2**32, size=(5, 64), dtype=np.uint64).astype(np.uint32))
    s = jnp.asarray(rs.randint(0, 2, size=(64,)).astype(np.uint32))
    got = eng.poly_mul_torus_binary(a, s, params)
    want = oracle.poly_mul_torus_binary(a, s, params)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("engine_name", ["matmul", "matmul_bf16"])
def test_external_product_engine_vs_oracle(engine_name):
    params = TFHEParams(n=16, N=64)
    eng = get_engine(engine_name)
    oracle = get_engine("oracle")
    rs = np.random.RandomState(4)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(2 * params.l, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    digits = jnp.asarray(
        rs.randint(-params.half_bg, params.half_bg, size=(3, 2 * params.l, params.N)).astype(
            np.int32
        )
    )
    got = eng.external_product_digits(eng.prepare_trgsw(rows, params), digits, params)
    want = oracle.external_product_digits(oracle.prepare_trgsw(rows, params), digits, params)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_rotate_binary_matches_rotate():
    rs = np.random.RandomState(7)
    p = jnp.asarray(rs.randint(0, 2**32, size=(6, 2, 32), dtype=np.uint64).astype(np.uint32))
    ns = jnp.asarray(rs.randint(0, 64, size=(6, 1)).astype(np.int32))
    got = poly.rotate_binary(p, ns)
    want = poly.rotate(p, ns)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # signed dtype too
    q = jnp.asarray(rs.randint(-100, 100, size=(4, 16)).astype(np.int32))
    ms = jnp.asarray(rs.randint(0, 32, size=(4,)).astype(np.int32))
    assert np.array_equal(
        np.asarray(poly.rotate_binary(q, ms)),
        np.asarray(poly.rotate(q, ms)),
    )


def test_pallas_engine_interpret_exact():
    # Fused Pallas step (interpret mode) vs the XLA matmul engine: exact.
    from rustfhe_tpu.engine.pallas_step import PallasEngine
    from rustfhe_tpu.engine import get_engine as _ge

    params = TFHEParams(n=8, N=1024)
    rs = np.random.RandomState(11)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(6, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    digits = jnp.asarray(
        rs.randint(-params.half_bg, params.half_bg, size=(256, 6, params.N)).astype(np.int32)
    )
    m = _ge("matmul")
    want = m.external_product_digits(m.prepare_trgsw(rows, params), digits, params)
    pe = PallasEngine(interpret=True)
    got = pe.external_product_digits(pe.prepare_trgsw(rows, params), digits, params)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_pallas_fused_cmux_step_interpret_exact():
    # The fully fused blind-rotate step (rotate+decompose+matmul+recombine+
    # accumulate) vs the composed default path: exact.
    from rustfhe_tpu import poly as rpoly, trgsw as rtrgsw
    from rustfhe_tpu.engine import get_engine as _ge
    from rustfhe_tpu.engine.pallas_step import PallasEngine

    params = TFHEParams(n=8, N=1024)
    rs = np.random.RandomState(17)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(6, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    acc = jnp.asarray(
        rs.randint(0, 2**32, size=(128, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    ai = jnp.asarray(rs.randint(0, 2 * params.N, size=(128,)).astype(np.int32))
    m = _ge("matmul")
    rot = rpoly.rotate_binary(acc, ai[:, None])
    diff = (rot - acc).astype(U32)
    want = (
        acc
        + m.external_product_digits(
            m.prepare_trgsw(rows, params), rtrgsw.decompose_trlwe(diff, params), params
        )
    ).astype(U32)
    pe = PallasEngine(interpret=True, merge_c=False)
    got = pe.cmux_step(pe.prepare_trgsw(rows, params), acc, ai, params)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # c-merged variant (both output halves in one program): also exact.
    pm = PallasEngine(interpret=True, merge_c=True)
    got_m = pm.cmux_step(pm.prepare_trgsw(rows, params), acc, ai, params)
    assert np.array_equal(np.asarray(got_m), np.asarray(want))


def test_pallas_k_scan_layout_roundtrip():
    from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine

    params = TFHEParams(n=8, N=1024)
    rs = np.random.RandomState(3)
    acc = jnp.asarray(
        rs.randint(0, 2**32, size=(5, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    ke = PallasKaratsubaEngine(interpret=True)
    flat = ke.scan_enter(acc, params)
    assert flat.shape == (5, 2 * params.N)
    back = ke.scan_exit(flat, params)
    assert np.array_equal(np.asarray(back), np.asarray(acc))


def test_pallas_k_extprod_interpret_exact():
    # Karatsuba even/odd fused external product (interpret) vs matmul: exact.
    from rustfhe_tpu.engine import get_engine as _ge
    from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine

    params = TFHEParams(n=8, N=1024)
    rs = np.random.RandomState(23)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(6, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    digits = jnp.asarray(
        rs.randint(-params.half_bg, params.half_bg, size=(256, 6, params.N)).astype(np.int32)
    )
    m = _ge("matmul")
    want = m.external_product_digits(m.prepare_trgsw(rows, params), digits, params)
    ke = PallasKaratsubaEngine(interpret=True)
    got = ke.external_product_digits(ke.prepare_trgsw(rows, params), digits, params)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_pallas_k_cmux_step_interpret_exact():
    # Fused Karatsuba CMux step in e/o layout vs the composed default path.
    from rustfhe_tpu import poly as rpoly, trgsw as rtrgsw
    from rustfhe_tpu.engine import get_engine as _ge
    from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine

    params = TFHEParams(n=8, N=1024)
    rs = np.random.RandomState(29)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(6, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    acc = jnp.asarray(
        rs.randint(0, 2**32, size=(128, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    ai = jnp.asarray(rs.randint(0, 2 * params.N, size=(128,)).astype(np.int32))
    m = _ge("matmul")
    rot = rpoly.rotate_binary(acc, ai[:, None])
    diff = (rot - acc).astype(U32)
    want = (
        acc
        + m.external_product_digits(
            m.prepare_trgsw(rows, params), rtrgsw.decompose_trlwe(diff, params), params
        )
    ).astype(U32)
    ke = PallasKaratsubaEngine(interpret=True)
    flat = ke.scan_enter(acc, params)
    got_flat = ke.cmux_step(ke.prepare_trgsw(rows, params), flat, ai, params)
    got = ke.scan_exit(got_flat, params)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_cloud_key_panels_noop_for_engines_without_panels():
    # Engines without prepare_panels (the XLA matmul path) return the key
    # unchanged — latency_mode is safe to request on any backend.
    import jax as _jax
    from rustfhe_tpu import keys as rkeys
    from rustfhe_tpu.keys import cloud_key_panels

    params = TFHEParams(n=4, N=16)
    sk, ck = rkeys.gen_keys(_jax.random.PRNGKey(0), params, engine_name="matmul")
    ck2 = cloud_key_panels(ck, params, "matmul")
    assert ck2.bk is ck.bk and ck2.ksk is ck.ksk


def test_pallas_k_latency_mode_panels_bit_exact():
    # Latency mode: cmux_step fed precomputed panel tables (prepare_panels)
    # must match the per-step-build path bit-for-bit, end to end through a
    # full gate (the form is detected by the trailing panel width).
    from rustfhe_tpu import gates, keys as rkeys, tlwe as rtlwe
    from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine
    from rustfhe_tpu.keys import cloud_key_panels

    params = TFHEParams(n=12, N=256, alpha_lv0=2.0**-20, alpha_lv1=2.0**-28)
    eng = PallasKaratsubaEngine(interpret=True, tb=8, levels=1)
    key = jax.random.PRNGKey(21)
    kg, ke = jax.random.split(key)
    sk, ck = rkeys.gen_keys(kg, params, engine_name=eng)
    ck_lat = cloud_key_panels(ck, params, eng)
    assert ck_lat.bk.shape[-1] == 2 * (params.N >> 1) - eng.tm

    bits = jnp.zeros((8,), U32).at[1::2].set(1)
    cx = rtlwe.encrypt_binary(jax.random.fold_in(ke, 0), sk.lv0, bits, params)
    cy = rtlwe.encrypt_binary(jax.random.fold_in(ke, 1), sk.lv0, 1 - bits, params)
    ref = gates.hom_nand(ck, cx, cy, params=params, engine_name=eng)
    got = gates.hom_nand(ck_lat, cx, cy, params=params, engine_name=eng)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_k2_interpret_exact():
    # Two-level Karatsuba (Z = X^4, nine quarter-size convs): extprod and
    # fused step vs the matmul path, exact (interpret mode).
    from rustfhe_tpu import poly as rpoly, trgsw as rtrgsw
    from rustfhe_tpu.engine import get_engine as _ge
    from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine

    params = TFHEParams(n=8, N=1024)
    rs = np.random.RandomState(31)
    rows = jnp.asarray(
        rs.randint(0, 2**32, size=(6, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    digits = jnp.asarray(
        rs.randint(-params.half_bg, params.half_bg, size=(128, 6, params.N)).astype(np.int32)
    )
    acc = jnp.asarray(
        rs.randint(0, 2**32, size=(128, 2, params.N), dtype=np.uint64).astype(np.uint32)
    )
    ai = jnp.asarray(rs.randint(0, 2 * params.N, size=(128,)).astype(np.int32))
    m = _ge("matmul")
    prep_m = m.prepare_trgsw(rows, params)
    want_ep = m.external_product_digits(prep_m, digits, params)
    rot = rpoly.rotate_binary(acc, ai[:, None])
    diff = (rot - acc).astype(U32)
    want_step = (
        acc + m.external_product_digits(prep_m, rtrgsw.decompose_trlwe(diff, params), params)
    ).astype(U32)

    k2 = PallasKaratsubaEngine(interpret=True, levels=2)
    prep = k2.prepare_trgsw(rows, params)
    got_ep = k2.external_product_digits(prep, digits, params)
    assert np.array_equal(np.asarray(got_ep), np.asarray(want_ep))
    got_step = k2.scan_exit(k2.cmux_step(prep, k2.scan_enter(acc, params), ai, params), params)
    assert np.array_equal(np.asarray(got_step), np.asarray(want_step))


class _EdgeBrokenEngine:
    """Deliberately broken engine: wrong ONLY where a most-negative digit
    (-half_bg) multiplies a row byte equal to 0x80 — the limb sign-overflow
    edge a single random probe sample catches only with ~50% probability at
    N=1024 (P(per-position) = 1/Bg * 1/256).  The adversarial probe set must
    catch it deterministically."""

    name = "edge_broken"

    def __init__(self):
        from rustfhe_tpu.engine import get_engine

        self._oracle = get_engine("oracle")

    def prepare_trgsw(self, rows, params):
        return self._oracle.prepare_trgsw(rows, params)

    def external_product_digits(self, prepared, digits, params):
        out = self._oracle.external_product_digits(prepared, digits, params)
        # Inject the edge fault: if any (digit == -half_bg, row byte == 0x80)
        # pair exists, corrupt the first output coefficient.
        rows_bytes = np.asarray(prepared).view(np.uint8)
        has_edge_row = bool((rows_bytes == 0x80).any())
        has_edge_digit = bool((np.asarray(digits) == -params.half_bg).any())
        if has_edge_row and has_edge_digit:
            out = out.at[..., 0, 0].add(jnp.uint32(1))
        return out


def test_probe_vectors_catch_edge_broken_engine():
    from rustfhe_tpu.engine import engine_exact_on_probe, get_engine, probe_vectors

    params = TFHEParams(n=16, N=64)
    rows, digits = probe_vectors(params)
    rows_j, digits_j = jnp.asarray(rows), jnp.asarray(digits)
    oracle = get_engine("oracle")
    want = oracle.external_product_digits(
        oracle.prepare_trgsw(rows_j, params), digits_j, params
    )
    assert engine_exact_on_probe(get_engine("matmul"), params, rows_j, digits_j, want)
    assert not engine_exact_on_probe(_EdgeBrokenEngine(), params, rows_j, digits_j, want)
    # The probe set must contain both edge triggers by construction.
    assert (np.asarray(rows).view(np.uint8) == 0x80).any()
    assert (digits == -params.half_bg).any()


def test_probe_result_distinguishes_failure_causes():
    """engine_probe_result reports WHY a probe failed: an engine that ran
    but was inexact reads 'INEXACT'; one that raised (compile failure)
    carries the exception text — the diagnostic RUSTFHE_ENGINE overrides
    need when the remote-compile path degrades."""
    from rustfhe_tpu.engine import engine_probe_result, get_engine, probe_vectors

    params = TFHEParams(n=16, N=64)
    rows, digits = probe_vectors(params)
    rows_j, digits_j = jnp.asarray(rows), jnp.asarray(digits)
    oracle = get_engine("oracle")
    want = oracle.external_product_digits(
        oracle.prepare_trgsw(rows_j, params), digits_j, params
    )
    ok, why = engine_probe_result(get_engine("matmul"), params, rows_j, digits_j, want)
    assert ok and why == "exact"
    ok, why = engine_probe_result(_EdgeBrokenEngine(), params, rows_j, digits_j, want)
    assert not ok and "INEXACT" in why

    class _Crashing:
        name = "crashing"

        def prepare_trgsw(self, rows, params):
            raise RuntimeError("Mosaic lowering failed: simulated")

        def external_product_digits(self, prepared, digits, params):
            raise AssertionError("unreachable")

    ok, why = engine_probe_result(_Crashing(), params, rows_j, digits_j, want)
    assert not ok
    assert "failed to execute" in why and "simulated" in why
    assert "INEXACT" not in why


def test_pallas_k_hybrid_mode_bit_exact():
    # Hybrid mode (keys.cloud_key_hybrid): blind rotation as 2-step fused
    # pairs (odd-step panels prebuilt, even built per step) + a standard
    # tail step for odd n — must match the standard scan bit-for-bit
    # through a full gate.  n=13 exercises 6 pairs AND the leftover step.
    from rustfhe_tpu import gates, keys as rkeys, tlwe as rtlwe
    from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine
    from rustfhe_tpu.keys import HybridBK, cloud_key_hybrid

    params = TFHEParams(n=13, N=256, alpha_lv0=2.0**-20, alpha_lv1=2.0**-28)
    eng = PallasKaratsubaEngine(interpret=True, tb=8, levels=1)
    key = jax.random.PRNGKey(23)
    kg, ke = jax.random.split(key)
    sk, ck = rkeys.gen_keys(kg, params, engine_name=eng)
    ck_h = cloud_key_hybrid(ck, params, eng)
    assert isinstance(ck_h.bk, HybridBK)
    assert ck_h.bk.prep_even.shape[0] == 6 and ck_h.bk.prep_tail.shape[0] == 1
    assert cloud_key_hybrid(ck_h, params, eng).bk is ck_h.bk  # idempotent

    bits = jnp.zeros((8,), U32).at[1::2].set(1)
    cx = rtlwe.encrypt_binary(jax.random.fold_in(ke, 0), sk.lv0, bits, params)
    cy = rtlwe.encrypt_binary(jax.random.fold_in(ke, 1), sk.lv0, 1 - bits, params)
    ref = gates.hom_nand(ck, cx, cy, params=params, engine_name=eng)
    got = gates.hom_nand(ck_h, cx, cy, params=params, engine_name=eng)
    assert np.array_equal(np.asarray(got), np.asarray(ref))

    # full_panels variant (latency configuration: even AND tail panels
    # prebuilt too, zero in-step builds) — still bit-exact.
    ck_f = cloud_key_hybrid(ck, params, eng, full_panels=True)
    assert isinstance(ck_f.bk, HybridBK)
    assert ck_f.bk.prep_even.shape != ck_h.bk.prep_even.shape  # panel form
    got_f = gates.hom_nand(ck_f, cx, cy, params=params, engine_name=eng)
    assert np.array_equal(np.asarray(got_f), np.asarray(ref))


def test_rotate_all_steps_latency_kernel_bit_exact():
    """Single-launch latency rotation (fused_rotate_all_k: all n steps in
    one kernel, panel blocks pipelined by the grid) must match the
    per-step scan bit-for-bit through a full gate — single-tile AND
    multi-tile (batch-tile outer grid dim) forms."""
    from rustfhe_tpu import gates, keys as rkeys, tlwe as rtlwe
    from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine

    params = TFHEParams(n=13, N=256, alpha_lv0=2.0**-20, alpha_lv1=2.0**-28)
    eng = PallasKaratsubaEngine(interpret=True, tb=8, levels=1)
    kg, ke = jax.random.split(jax.random.PRNGKey(29))
    sk, ck = rkeys.gen_keys(kg, params, engine_name=eng)
    ck_lat = rkeys.cloud_key_panels(ck, params, eng)
    assert ck_lat.bk.ndim == 4  # panel form with the step axis leading

    bits = jnp.zeros((4,), U32).at[1::2].set(1)
    cx = rtlwe.encrypt_binary(jax.random.fold_in(ke, 0), sk.lv0, bits, params)
    cy = rtlwe.encrypt_binary(jax.random.fold_in(ke, 1), sk.lv0, 1 - bits,
                              params)
    ref = gates.hom_nand(ck, cx, cy, params=params, engine_name=eng)
    got = gates.hom_nand(ck_lat, cx, cy, params=params, engine_name=eng)
    assert np.array_equal(np.asarray(got), np.asarray(ref))

    big = jnp.zeros((16,), U32).at[1::2].set(1)  # 16 = 2 tiles of tb=8
    cx2 = rtlwe.encrypt_binary(jax.random.fold_in(ke, 2), sk.lv0, big, params)
    cy2 = rtlwe.encrypt_binary(jax.random.fold_in(ke, 3), sk.lv0, 1 - big,
                               params)
    ref2 = gates.hom_nand(ck, cx2, cy2, params=params, engine_name=eng)
    got2 = gates.hom_nand(ck_lat, cx2, cy2, params=params, engine_name=eng)
    assert np.array_equal(np.asarray(got2), np.asarray(ref2))


def test_cloud_key_hybrid_noop_for_engines_without_pair_step():
    import jax as _jax
    from rustfhe_tpu import keys as rkeys
    from rustfhe_tpu.keys import cloud_key_hybrid

    params = TFHEParams(n=4, N=16)
    sk, ck = rkeys.gen_keys(_jax.random.PRNGKey(0), params, engine_name="matmul")
    ck2 = cloud_key_hybrid(ck, params, "matmul")
    assert ck2.bk is ck.bk and ck2.ksk is ck.ksk
