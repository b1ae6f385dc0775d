"""Noise-budget model tests: the analytic margin must separate the
parameter sets whose on-device behavior is known — DEFAULT decodes
8192/8192 gates correctly (>=5 sigma), the FAST preset measured 12/8192
failures (~3 sigma)."""

from rustfhe_tpu.params import DEFAULT_PARAMS, FAST_PARAMS, N2048_PARAMS, TEST_PARAMS
from rustfhe_tpu.utils.noise import check_params, noise_budget


def test_default_params_have_margin():
    ok, msg = check_params(DEFAULT_PARAMS)
    assert ok, msg
    assert noise_budget(DEFAULT_PARAMS).margin_sigmas > 8


def test_fast_preset_flagged_unsound():
    # Measured on device (BENCH.md 2026-08-18): 12/8192 wrong NANDs ~ 3 sigma.
    b = noise_budget(FAST_PARAMS)
    assert 2.5 < b.margin_sigmas < 4.5, b
    ok, msg = check_params(FAST_PARAMS)
    assert not ok, msg
    # and the failure is decomposition-dominated, as diagnosed.
    comps = b.components()
    assert max(comps, key=comps.get) == "blind_rotate"


def test_other_presets_sound():
    for p in (N2048_PARAMS, TEST_PARAMS):
        ok, msg = check_params(p)
        assert ok, msg


def test_second_calibration_anchor_recorded():
    # Anchor 2 (BK-noise axis, measured 2026-08-20 on device at B=131072,
    # benches/noise_calibration_probe.py): the marginal presets below
    # PREDICT 2.8/3.4 sigma here but MEASURED 0 failures each — the model
    # must keep scoring them in that (conservative) band so the docstring's
    # calibration claim stays true, and must keep flagging them unsound.
    for exp, lo, hi in ((21.5, 2.5, 3.2), (21.8, 3.1, 3.8)):
        p = DEFAULT_PARAMS.replace(alpha_lv1=2.0 ** -exp)
        b = noise_budget(p)
        assert lo < b.margin_sigmas < hi, (exp, b.margin_sigmas)
        ok, _ = check_params(p)
        assert not ok


def test_budget_components_positive():
    b = noise_budget(DEFAULT_PARAMS)
    assert all(v > 0 for v in b.components().values())
    assert abs(
        sum(b.components().values()) - b.sigma_total**2
    ) < 1e-12
