"""Key generation: secret keys, key-switching key, bootstrapping key.

Mirrors ``TFHE::new`` (reference ``hom_nand/src/tfhe.rs:21-25``):
  * KSK lv1->lv0: N x iks_l x T TLWE encryptions of t*s_i/2^(basebit*(l+1))
    (tlwe.rs:246-277) — fully vectorized here instead of the reference's
    triple loop (which carries a "could be multithreaded" TODO, tlwe.rs:264).
  * BK: n TRGSW encryptions of the lv0 key bits under the lv1 key, stored in
    the engine's prepared (fast) representation — the analogue of the
    pre-FFT'd ``TRGSWRepF`` bootstrapping key (tfhe.rs:116-135).

All randomness flows from one ``jax.random`` key: keygen is deterministic
and reproducible, which the reference (thread_rng everywhere) cannot do.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import tlwe, trgsw
from .engine import resolve_engine
from .params import TFHEParams
from .utils.rng import binary_array

U32 = jnp.uint32


class SecretKey(NamedTuple):
    """lv0: (n,) uint32 bits; lv1: (N,) uint32 bits."""

    lv0: jnp.ndarray
    lv1: jnp.ndarray


class CloudKey(NamedTuple):
    """Evaluation key material in engine-prepared form.

    bk:  engine-prepared TRGSW rows with leading axis n (one per lv0 bit).
    ksk: engine-prepared key-switching table.
    """

    bk: object
    ksk: object


def gen_secret_key(key, params: TFHEParams) -> SecretKey:
    k0, k1 = jax.random.split(key)
    return SecretKey(
        lv0=binary_array(k0, (params.n,)),
        lv1=binary_array(k1, (params.N,)),
    )


def gen_key_switching_key_raw(key, sk: SecretKey, params: TFHEParams) -> jnp.ndarray:
    """Raw KSK: uint32 (N, iks_l, T, n+1); slot t encrypts
    (t+1) * s1_i * 2^(32 - basebit*(l+1)) (tlwe.rs:252-258, exact power-of-two
    messages so the integer form matches the reference's f32 arithmetic)."""
    N, L, T = params.N, params.iks_l, params.iks_t
    bb = params.iks_basebit
    s1 = sk.lv1.astype(U32)  # (N,)
    t_vals = jnp.arange(1, T + 1, dtype=U32)  # (T,)
    shifts = jnp.array([32 - bb * (l + 1) for l in range(L)], U32)  # (L,)
    # msg[i, l, t] = (t+1) * s1[i] << (32 - bb*(l+1)), wrapping
    msgs = (s1[:, None, None] * t_vals[None, None, :]) << shifts[None, :, None]
    return tlwe.encrypt_torus(key, sk.lv0, msgs.astype(U32), params)


def gen_bootstrapping_key_raw(key, sk: SecretKey, params: TFHEParams, engine) -> jnp.ndarray:
    """Raw BK: uint32 (n, 2L, 2, N) — TRGSW(s0_i) under s1 (tfhe.rs:119-126)."""
    return trgsw.encrypt_int(key, sk.lv1, sk.lv0.astype(jnp.int32), params, engine)


def gen_cloud_key(key, sk: SecretKey, params: TFHEParams, engine_name="matmul") -> CloudKey:
    """Generate the evaluation key, fully jitted.

    ``engine_name``: registered name or engine instance (the key is stored
    in that engine's prepared representation).

    jit matters here for memory, not just speed: the limb-splitting and key
    preparation create large intermediates that eager mode keeps alive;
    under jit XLA frees/fuses them, keeping peak HBM far lower.
    """
    engine = resolve_engine(engine_name)

    @partial(jax.jit, static_argnames=())
    def _gen(key, sk):
        kb, kk = jax.random.split(key)
        bk_raw = gen_bootstrapping_key_raw(kb, sk, params, engine)
        ksk_raw = gen_key_switching_key_raw(kk, sk, params)
        return CloudKey(
            bk=engine.prepare_trgsw(bk_raw, params),
            ksk=engine.prepare_ksk(ksk_raw, params),
        )

    return _gen(key, sk)


#: number of large (>1/4 device memory) panel/hybrid tables built in this
#: process — the "one panel key per process" rule (see _guard_panel_hbm).
_BIG_PANEL_BUILDS = 0


def _note_big_panel_build() -> None:
    global _BIG_PANEL_BUILDS
    _BIG_PANEL_BUILDS += 1


def _device_bytes_limit():
    """The accelerator's memory capacity in bytes, or None when unknown
    (CPU backends typically expose no limit)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit")


def _guard_panel_hbm(need: int, params: TFHEParams, what: str,
                     device_bytes_limit=None) -> bool:
    """Fail with a clear error BEFORE XLA RESOURCE_EXHAUSTs on a panel build.

    Two documented failure modes become API guarantees here (VERDICT r4 #7):
      * the table simply does not fit (N=2048: 47 GB of panels vs ~16 GB of
        v5e HBM — there is no latency mode at that parameter point; use the
        standard per-step key);
      * only ONE large panel/hybrid table fits per PROCESS — even building
        a second one serially after releasing the first RESOURCE_EXHAUSTs
        (XLA does not compact HBM), so a second large build raises.
    """
    limit = device_bytes_limit if device_bytes_limit is not None else _device_bytes_limit()
    if limit is None:
        return False
    gib = 1024.0**3
    if need > 0.92 * limit:
        raise MemoryError(
            f"{what} needs ~{need / gib:.1f} GiB of panel tables at "
            f"N={params.N}, n={params.n}, but the device has only "
            f"{limit / gib:.1f} GiB: there is no latency/panel mode at this "
            "parameter set — use the standard per-step key (the scan "
            "overlaps the panel build), or cloud_key_hybrid(full_panels="
            "False) if the half-size table fits."
        )
    if need > 0.25 * limit:
        if _BIG_PANEL_BUILDS >= 1:
            raise MemoryError(
                f"only one large panel/hybrid key fits per process: a "
                f"previous build already consumed its HBM, and XLA does not "
                f"compact freed device memory, so this second "
                f"~{need / gib:.1f} GiB {what} would RESOURCE_EXHAUST even "
                "if the first key was released.  Build each panel key in "
                "its own process (see CLAUDE.md / BENCH.md latency mode)."
            )
        return True  # caller notes the build AFTER it succeeds
    return False


def cloud_key_panels(ck: CloudKey, params: TFHEParams, engine_name,
                     device_bytes_limit=None) -> CloudKey:
    """Latency-mode cloud key: the bootstrapping key's per-step kernel
    panel tables precomputed once (engines without ``prepare_panels`` —
    the non-Pallas paths — are returned unchanged).

    Costs n * ~21 MB of HBM at production parameters (~13.5 GB) and pays
    off when the gate batch is small enough that the per-step panel build
    is not hidden under the kernel (B <~ 2048; benches/latency_probe.py).
    Large-batch throughput should keep the standard key: the build is
    overlapped there and the panel array would crowd out the accumulator.

    Raises MemoryError with the fix spelled out when the table cannot fit
    (no latency mode exists at N=2048: 47 GB of panels) or when a second
    large panel key is built in the same process (only one fits — XLA does
    not compact HBM; see _guard_panel_hbm).  ``device_bytes_limit``
    overrides the queried device capacity (tests).
    """
    engine = resolve_engine(engine_name)
    prep = getattr(engine, "prepare_panels", None)
    if prep is None:
        return ck
    est = getattr(engine, "panels_nbytes", None)
    big = False
    if est is not None:
        big = _guard_panel_hbm(est(ck.bk, params), params,
                               "cloud_key_panels", device_bytes_limit)
    out = CloudKey(bk=prep(ck.bk, params), ksk=ck.ksk)
    if big:  # note the slot only once the build actually succeeded
        _note_big_panel_build()
    return out


class HybridBK(NamedTuple):
    """Bootstrapping key in HYBRID form (cloud_key_hybrid): the blind
    rotation runs as 2-step fused pairs — the even step's kernel panel
    table built per step (overlapped, as in the standard scan), the odd
    step's PREBUILT here — plus a tail of standard single steps when n is
    odd.  Half the latency-mode table (~6.3 GB at production parameters)
    buys the unrolled kernel's halved accumulator HBM traffic at ANY batch
    size, including ones the full 12.6 GiB table cannot fit."""

    prep_even: jnp.ndarray   # (n//2, ...) engine-prepared TRGSW rows
    panels_odd: jnp.ndarray  # (n//2, ...) prebuilt kernel panel tables
    prep_tail: jnp.ndarray   # (n % 2, ...) leftover standard step(s)


def cloud_key_hybrid(ck: CloudKey, params: TFHEParams, engine_name,
                     full_panels: bool = False,
                     device_bytes_limit=None) -> CloudKey:
    """Hybrid-mode cloud key: odd-step panel tables precomputed, even built
    per step.  Engines without a fused pair step (non-Pallas paths) are
    returned unchanged.  Measured +7.7% throughput over the standard key
    (1.730 vs 1.863 ms/step, benches/hybrid_unroll_probe.py), bit-exact.

    ``full_panels=True`` prebuilds the EVEN steps' panel tables too
    (latency-mode HBM cost, ~12.6 GiB at production parameters): the scan
    runs n//2 fused pair steps with zero in-step panel builds — the
    single-gate / interactive latency configuration (the per-step fixed
    cost, not the MXU work, is the small-batch floor)."""
    engine = resolve_engine(engine_name)
    prep = getattr(engine, "prepare_panels", None)
    if prep is None or not hasattr(engine, "cmux_step_pair"):
        return ck
    if isinstance(ck.bk, HybridBK):
        return ck
    est = getattr(engine, "panels_nbytes", None)
    big = False
    if est is not None:
        # full_panels prebuilds every step's table (latency-mode cost);
        # otherwise only the odd steps' half is materialized.
        total = est(ck.bk, params)
        big = _guard_panel_hbm(total if full_panels else total // 2, params,
                               "cloud_key_hybrid", device_bytes_limit)
    n = ck.bk.shape[0]
    npairs = n // 2
    even = ck.bk[0 : 2 * npairs : 2]
    tail = ck.bk[2 * npairs :]
    if full_panels:
        even = prep(even, params)
        tail = prep(tail, params) if tail.shape[0] else tail
    out = CloudKey(
        bk=HybridBK(
            prep_even=even,
            panels_odd=prep(ck.bk[1 : 2 * npairs : 2], params),
            prep_tail=tail,
        ),
        ksk=ck.ksk,
    )
    if big:  # note the slot only once the build actually succeeded
        _note_big_panel_build()
    return out


def gen_cloud_key_raw(key, sk: SecretKey, params: TFHEParams,
                      engine_name="matmul"):
    """(bk_raw, ksk_raw) uint32 — the engine-INDEPENDENT evaluation keys
    (every engine is exact mod 2^32, so the raw bytes do not depend on
    ``engine_name``; it only selects the encryption-path engine).  This is
    what ``utils.serialization.save_cloud_key_raw`` persists: prepare once
    per engine on load instead of re-running keygen per process (VERDICT
    r4 #3 — PBS_PARAMS keygen costs ~657 s through the relay)."""
    engine = resolve_engine(engine_name)

    @jax.jit
    def _gen(key, sk):
        kb, kk = jax.random.split(key)
        return (
            gen_bootstrapping_key_raw(kb, sk, params, engine),
            gen_key_switching_key_raw(kk, sk, params),
        )

    return _gen(key, sk)


def gen_keys(key, params: TFHEParams = None, engine_name="matmul"):
    """One-call keygen: (SecretKey, CloudKey).

    ``engine_name=None`` auto-selects the fastest exact engine for the
    device (engine.select_fast_engine — runs an on-device probe; pass an
    explicit name to skip it)."""
    if params is None:
        from .params import DEFAULT_PARAMS

        params = DEFAULT_PARAMS
    if engine_name is None:
        from .engine import select_fast_engine

        engine_name = select_fast_engine(params)
    ks, kc = jax.random.split(key)
    sk = gen_secret_key(ks, params)
    ck = gen_cloud_key(kc, sk, params, engine_name)
    return sk, ck
