"""Latency-mode HBM guard (keys._guard_panel_hbm; VERDICT r4 #7).

The two failure modes a latency-mode user hits first — a panel table that
cannot fit (N=2048: ~44 GiB vs ~16 GiB of v5e HBM) and a second large panel
key in one process (XLA does not compact HBM) — must surface as clear
MemoryErrors from keygen, not as raw XLA RESOURCE_EXHAUSTs mid-build.
"""

import jax
import jax.numpy as jnp
import pytest

from rustfhe_tpu import keys
from rustfhe_tpu.engine import get_engine
from rustfhe_tpu.params import DEFAULT_PARAMS, PBS_PARAMS

GIB = 1024**3
V5E_HBM = 16 * GIB


def _fake_prepared_bk(params, engine):
    """ShapeDtypeStruct with the pallas_k engine's prepared-row layout
    (n, 2, 2L*K*3^L, 2*ns) — the guard only reads .shape, and the build
    must raise BEFORE any table is materialized."""
    T = 3**engine.levels
    ns = params.N >> engine.levels
    shape = (params.n, 2, 2 * params.l * engine.num_limbs * T, 2 * ns)
    return jax.ShapeDtypeStruct(shape, jnp.int8)


def test_no_latency_mode_at_n2048():
    eng = get_engine("pallas_k2")
    ck = keys.CloudKey(bk=_fake_prepared_bk(PBS_PARAMS, eng), ksk=None)
    # ~44 GiB of panels: the clear no-fit error, before any allocation.
    with pytest.raises(MemoryError, match="no latency/panel mode"):
        keys.cloud_key_panels(ck, PBS_PARAMS, "pallas_k2",
                              device_bytes_limit=V5E_HBM)
    with pytest.raises(MemoryError, match="no latency/panel mode"):
        keys.cloud_key_hybrid(ck, PBS_PARAMS, "pallas_k2", full_panels=True,
                              device_bytes_limit=V5E_HBM)


def test_n2048_estimate_matches_documented_size():
    eng = get_engine("pallas_k2")
    bk = _fake_prepared_bk(PBS_PARAMS, eng)
    est = eng.panels_nbytes(bk, PBS_PARAMS)
    assert 40 * GIB < est < 50 * GIB  # the documented "47 GB" table


def test_one_large_panel_key_per_process(monkeypatch):
    monkeypatch.setattr(keys, "_BIG_PANEL_BUILDS", 0)
    need = int(12.6 * GIB)  # the default-set panel table
    # First build passes the guard; the slot is consumed only once the
    # build SUCCEEDS (a failed build must not block retries — round-5
    # review fix), which callers signal via _note_big_panel_build.
    assert keys._guard_panel_hbm(need, DEFAULT_PARAMS, "cloud_key_panels",
                                 device_bytes_limit=V5E_HBM) is True
    assert keys._BIG_PANEL_BUILDS == 0  # guard alone never consumes
    # Retry after a hypothetical failure: still allowed.
    assert keys._guard_panel_hbm(need, DEFAULT_PARAMS, "cloud_key_panels",
                                 device_bytes_limit=V5E_HBM) is True
    keys._note_big_panel_build()  # the build succeeded
    with pytest.raises(MemoryError, match="one large panel/hybrid key"):
        keys._guard_panel_hbm(need, DEFAULT_PARAMS, "cloud_key_panels",
                              device_bytes_limit=V5E_HBM)


def test_small_tables_never_tripped(monkeypatch):
    monkeypatch.setattr(keys, "_BIG_PANEL_BUILDS", 0)
    for _ in range(4):  # small-params tables: no rule applies
        keys._guard_panel_hbm(64 * 1024**2, DEFAULT_PARAMS, "cloud_key_panels",
                              device_bytes_limit=V5E_HBM)
    assert keys._BIG_PANEL_BUILDS == 0


def test_unknown_limit_is_permissive(monkeypatch):
    # CPU backends report no capacity: the guard must not block anything.
    monkeypatch.setattr(keys, "_BIG_PANEL_BUILDS", 0)
    monkeypatch.setattr(keys, "_device_bytes_limit", lambda: None)
    keys._guard_panel_hbm(10**12, DEFAULT_PARAMS, "cloud_key_panels")


def test_panel_key_large_batch_fallback_warns():
    """The megakernel's large-batch fallback to the per-step scan is the
    right behavior, but a panel key was paid for — it must warn once
    (VERDICT r4 weak #4), then stay quiet."""
    import warnings

    import jax.numpy as jnp

    from rustfhe_tpu.engine.pallas_k import PallasKaratsubaEngine
    from rustfhe_tpu.params import DEFAULT_PARAMS as p

    eng = PallasKaratsubaEngine(tb=128, levels=2)  # fresh instance
    ns = p.N >> eng.levels
    panel_bk = jnp.zeros((2, 2, 8, 2 * ns - eng.tm), jnp.int8)
    B = 32 * eng.tb + 1  # one past the 32-tile cap
    acc = jnp.zeros((B, 2 * p.N), jnp.uint32)
    a_steps = jnp.zeros((2, B), jnp.int32)
    with pytest.warns(UserWarning, match="panel key ignored"):
        assert eng.rotate_all_steps(panel_bk, acc, a_steps, p) is None
    with warnings.catch_warnings():  # second call: silent
        warnings.simplefilter("error")
        assert eng.rotate_all_steps(panel_bk, acc, a_steps, p) is None
