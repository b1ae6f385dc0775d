"""Polynomial-arithmetic engines.

This package is the TPU-native equivalent of the reference's native layer
(the vendored spqlios f64 FFT: ``utils/src/spqlios/*`` + the ``Spqlios``
FFI wrapper, ``utils/src/spqlios.rs``).  TPUs have no native f64, so the
design replaces the approximate f64 FFT with *exact* integer arithmetic
mod 2^32 (SURVEY.md §7 design decision 1):

* ``OracleEngine`` — naive O(N^2) uint32 wrapping convolution.  Slow,
  trivially correct; the ground truth (the analogue of the reference's
  naive ``cross``, math.rs:237-257).
* ``MatmulEngine`` — the production engine.  Negacyclic convolution as one
  dense MXU matmul per blind-rotate step: bootstrapping-key polynomials are
  pre-split into balanced signed limbs, a negacyclic "circulant" operand is
  materialized per step, and the int8 (or bf16) matmul accumulates exactly;
  limbs recombine with wrapping shifts, giving bit-exact results mod 2^32.

Every engine implements the same three operations:
  ``prepare_trgsw``     — precompute the fast representation of TRGSW rows
                          (the analogue of ``TRGSWRepF``, trgsw.rs:64-108).
  ``external_product_digits`` — (digits, prepared rows) -> TRLWE pair.
  ``poly_mul_torus_binary``   — torus poly x binary poly (encrypt/decrypt).
"""

from __future__ import annotations

from typing import Protocol

import jax.numpy as jnp


class PolyEngine(Protocol):
    """Interface all polynomial engines implement."""

    name: str

    def prepare_trgsw(self, rows: jnp.ndarray, params) -> object:
        """Precompute the engine representation of TRGSW rows.

        ``rows``: uint32 ``(..., 2L, 2, N)`` — per row j, index 0 holds the
        cipher (b) polynomial and index 1 the mask (a) polynomial.
        """

    def external_product_digits(self, prepared, digits: jnp.ndarray, params) -> jnp.ndarray:
        """Accumulate sum_j digits[..., j, :] (*) rows[j] for both output polys.

        ``digits``: int32 ``(..., 2L, N)`` gadget digits (b digits then a
        digits, trgsw.rs:289-299).  Returns uint32 ``(..., 2, N)``.
        """

    def poly_mul_torus_binary(self, a: jnp.ndarray, s: jnp.ndarray, params) -> jnp.ndarray:
        """Negacyclic product of uint32 torus poly ``a (..., N)`` by binary
        poly ``s (N,)``, exact mod 2^32."""


from .oracle import OracleEngine  # noqa: E402
from .matmul import MatmulEngine  # noqa: E402

_ENGINES = {}


def register_engine(name: str, engine) -> None:
    _ENGINES[name] = engine


def get_engine(name: str = "matmul"):
    if name not in _ENGINES:
        raise KeyError(f"unknown engine {name!r}; have {sorted(_ENGINES)}")
    return _ENGINES[name]


def resolve_engine(engine):
    """Registry name or engine instance -> engine instance.

    Lets callers (keygen, the sharded gate builders) accept either a
    registered name ("pallas_k2") or a custom-configured instance (e.g. an
    interpret-mode Pallas engine with small tiles for virtual-mesh tests).
    """
    return get_engine(engine) if isinstance(engine, str) else engine


register_engine("oracle", OracleEngine())
register_engine("matmul", MatmulEngine())
register_engine("matmul_bf16", MatmulEngine(limb_bits=4, use_bf16=True))

from .pallas_step import PallasEngine  # noqa: E402
from .pallas_k import PallasKaratsubaEngine  # noqa: E402
from .transform import NussTransformEngine  # noqa: E402

register_engine("pallas", PallasEngine(tb=128))
register_engine("pallas_k", PallasKaratsubaEngine(tb=128, levels=1))
register_engine("pallas_k2", PallasKaratsubaEngine(tb=128, levels=2))
# Transform-domain reference engine (exact; NOT in the fast-select list —
# measured slower than Karatsuba-2 on the MXU, see ROADMAP.md).  Its
# prepare_trgsw builds tables host-side (numpy): use it with direct calls,
# not inside jitted keygen.
register_engine("nuss", NussTransformEngine())

# CPU-validation engine: exact f64-FFT convolution (the reference's own
# spqlios trick).  10-30x cheaper per step than the circulant matmul on CPU;
# needs jax_enable_x64 (its ops raise with the fix otherwise), so it is only
# auto-selected when x64 is on — and, like every engine, only after passing
# the oracle probe.
from .fft64 import FFT64Engine  # noqa: E402

register_engine("fft64", FFT64Engine())


def probe_vectors(params):
    """Adversarial (rows, digits) exactness-probe vectors.

    Beyond one random sample, the set stresses the failure modes integer
    engines actually have: limb-split sign/carry edges (row bytes 0x80,
    0x7F, 0xFF, 0x00), accumulator-magnitude extremes (all digits at the
    most-negative -half_bg against all-ones rows — the largest |partial
    sum| any input can produce), and digit-boundary values the balanced
    decomposition emits (exactly -half_bg, exactly half_bg - 1).

    Returns (rows u32 (2L, 2, N), digits i32 (P, 2L, N)) with P patterns
    batched so one oracle call covers them all.
    """
    import numpy as np

    shape_r = (2 * params.l, 2, params.N)
    size_r = int(np.prod(shape_r))
    rs = np.random.RandomState(1234)

    byte_edges = np.array([0x00, 0x01, 0x7F, 0x80, 0xFE, 0xFF], np.uint32)
    word_edges = np.array(
        [0x00000000, 0x00000001, 0x7FFFFFFF, 0x80000000, 0x80808080, 0xFFFFFFFF],
        np.uint32,
    )
    b = byte_edges[np.arange(size_r * 4) % len(byte_edges)].reshape(size_r, 4)
    rows = np.empty(size_r, np.uint32)
    third = size_r // 3
    # third 1: random; third 2: cycling word edges; third 3: cycling edge bytes.
    rows[:third] = rs.randint(0, 2**32, size=third, dtype=np.uint64).astype(np.uint32)
    rows[third : 2 * third] = word_edges[np.arange(third) % len(word_edges)]
    rest = size_r - 2 * third
    rows[2 * third :] = (
        b[:rest, 0] | (b[:rest, 1] << 8) | (b[:rest, 2] << 16) | (b[:rest, 3] << 24)
    )
    rows = rows.reshape(shape_r)

    hb = params.half_bg
    shape_d = (2 * params.l, params.N)
    digits = np.stack(
        [
            rs.randint(-hb, hb, size=shape_d),
            np.full(shape_d, -hb),  # most-negative digit everywhere
            np.full(shape_d, hb - 1),  # most-positive digit everywhere
            np.where(np.arange(params.N) % 2 == 0, -hb, hb - 1) * np.ones(shape_d, int),
        ]
    ).astype(np.int32)
    return rows, digits


def select_fast_engine(params=None) -> str:
    """Pick the fastest engine whose external product is exact on this backend.

    Candidates are probed in descending measured-speed order against the
    naive mod-2^32 oracle ON DEVICE over the adversarial ``probe_vectors``
    set (the int8 MXU path and the fused Pallas kernel must produce exact
    results on every pattern or they are skipped; the bf16 engine's
    accumulations are provably exact in f32 and is the fallback).

    ``RUSTFHE_ENGINE`` (env) narrows the probe to ONE named engine — an
    escape hatch when the full candidate cascade is expensive (e.g. a
    degraded remote-compile path) and the right engine for the device is
    already known.  The named engine is STILL gated by the on-device
    exactness probe (the repo invariant: engines must match the oracle
    before being selectable — exact-integer wrongness is invisible until
    decryption); an inexact override raises instead of returning.
    """
    import os

    import jax
    import numpy as np

    from ..params import DEFAULT_PARAMS

    params = params or DEFAULT_PARAMS
    rows, digits = probe_vectors(params)
    oracle = get_engine("oracle")
    # The ORACLE reference runs on the CPU backend: it is exact integer
    # arithmetic (backend-independent by construction), and the O(N^2)
    # convolution as a TPU program costs ~50 s of device/relay time per
    # process at N=2048 (measured round 5) vs ~2 s on host.  Candidate
    # engines still probe ON the target device — that is the invariant.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rows_cpu = jax.device_put(jnp.asarray(rows), cpu)
        digits_cpu = jax.device_put(jnp.asarray(digits), cpu)
        want = np.asarray(
            oracle.external_product_digits(
                oracle.prepare_trgsw(rows_cpu, params), digits_cpu, params
            )
        )
    rows = jnp.asarray(rows)
    digits = jnp.asarray(digits)
    override = os.environ.get("RUSTFHE_ENGINE")
    if override:
        ok, why = engine_probe_result(get_engine(override), params, rows, digits, want)
        if ok:
            return override
        # Distinguish "the engine computed WRONG results" from "the engine
        # failed to run at all" (e.g. a compile failure through a degraded
        # remote-compile relay) — the one diagnostic that matters here.
        raise RuntimeError(
            f"RUSTFHE_ENGINE={override!r} failed the oracle probe on this "
            f"backend: {why}"
        )
    on_cpu = jnp.ones(1).devices().pop().platform == "cpu"
    # Probe order = descending real-scan speed: pallas_k2 measured 6,214.8
    # gates/s vs pallas_k's 5,552 in the round-1 driver bench (BENCH.md).
    # The plain fused kernel stays as a fallback for parameter sets that
    # violate the Karatsuba constraints (e.g. bgbit=8 digit-sum overflow).
    # fft64 leads on CPU when x64 is enabled (10-30x faster per step than
    # the circulant matmul there; its exactness bound needs per-limb conv
    # sums below 2^53: 2L*N*half_bg*2^15 — generous for every preset here).
    names = ("pallas_k2", "pallas_k", "pallas", "matmul", "matmul_bf16")
    if on_cpu and jax.config.jax_enable_x64:
        names = ("fft64",) + names
    for name in names:
        if name.startswith("pallas_k"):
            levels = 2 if name == "pallas_k2" else 1
            if (
                params.N % (128 << levels) != 0  # leaf size must tile by 128
                or params.N > 2048  # panel table must fit raised VMEM cap
                or params.half_bg * (1 << levels) > 128  # digit sums in int8
                or on_cpu
            ):
                continue
        elif name == "pallas":
            if (
                params.N % 128 != 0
                or params.N > 2048
                or params.half_bg > 128  # digits must fit int8
                or on_cpu
            ):
                continue
        if engine_exact_on_probe(get_engine(name), params, rows, digits, want):
            return name
    raise RuntimeError("no engine computes the external product exactly on this backend")


def engine_probe_result(engine, params, rows, digits, want) -> tuple[bool, str]:
    """(ok, why): probe verdict with the failure CAUSE preserved.

    ``why`` distinguishes an engine that *ran but was inexact* (wrongness —
    the thing the invariant guards against) from one that *failed to
    execute* (typically a compile/runtime error on this backend), with the
    original exception text attached."""
    import numpy as np

    try:
        got = np.asarray(
            engine.external_product_digits(
                engine.prepare_trgsw(rows, params), digits, params
            )
        )
    except Exception as exc:  # noqa: BLE001 — cause is reported, not hidden
        return False, (
            f"failed to execute (compile/runtime error, NOT an exactness "
            f"verdict): {type(exc).__name__}: {exc}"
        )
    want = np.asarray(want)
    if got.shape != want.shape:
        return False, f"wrong output shape {got.shape} (want {want.shape})"
    if not np.array_equal(got, want):
        bad = got != want
        return False, (
            f"INEXACT results: {int(bad.sum())}/{bad.size} output words "
            f"differ from the mod-2^32 oracle"
        )
    return True, "exact"


def engine_exact_on_probe(engine, params, rows, digits, want) -> bool:
    """True iff ``engine`` reproduces the oracle on every probe pattern."""
    return engine_probe_result(engine, params, rows, digits, want)[0]

__all__ = [
    "PolyEngine",
    "OracleEngine",
    "MatmulEngine",
    "get_engine",
    "resolve_engine",
    "register_engine",
    "probe_vectors",
    "select_fast_engine",
    "engine_probe_result",
]
