"""Analytic noise-budget model for gate bootstrapping parameter sets.

The reference hard-codes one parameter set and offers no way to sanity-check
another; this round-1 lesson (the FAST preset decoded 12/8192 gates wrong on
device — a ~3-sigma margin, invisible at test dimensions) is encoded here as
a reusable tool: ``noise_budget(params)`` returns the per-stage error
variances of one bootstrapped gate and the decision margin in sigmas, and
``check_params`` turns that into a pass/warn verdict.

Model (standard TFHE analysis, variances of torus-valued errors in [0,1)):

* fresh gate input: two lv0 ciphertexts summed -> 2 * alpha_lv0^2;
* blind-rotate phase rounding to 2N buckets: the n+1 rounded coefficients
  each contribute U(+-2^-(nbit+2)) -> (n+1) * 2^(-2*(nbit+2)) / 3;
* per CMux step (external product, trgsw.rs:264-306):
    - BK noise term      2 * l * N * (Bg/2)^2 * alpha_lv1^2
    - gadget rounding    (1 + N) * eps^2,  eps = 2^-(l*bgbit)
      (the production decomp mask's quirky double-added rounding bit makes
      the rounding BIASED, so eps is the uncentered bound 2^-(l*bgbit),
      not the centered 2^-(l*bgbit+1); calibrated against the on-device
      FAST-preset failure: 12/8192 wrong gates = ~3 sigma, and this model
      scores FAST at 3.2 sigma)
  accumulated over the n steps of the rotation;
* identity key switch (tlwe.rs:43-73):
    - KSK noise          N * iks_l * alpha_lv0^2
    - decomposition drop N * 2^(-2*(iks_basebit*iks_l + 1)) / 3.

The decode decision needs the total phase error below 1/16 (the distance
from the +-1/8 gate constellation to the blind-rotate bucket boundary).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..params import TFHEParams

MARGIN = 1.0 / 16.0


@dataclass(frozen=True)
class NoiseBudget:
    var_fresh: float
    var_rounding: float
    var_bootstrap: float  # accumulated over the n CMux steps
    var_keyswitch: float
    sigma_total: float
    margin_sigmas: float

    def components(self) -> dict:
        return {
            "fresh_inputs": self.var_fresh,
            "phase_rounding": self.var_rounding,
            "blind_rotate": self.var_bootstrap,
            "key_switch": self.var_keyswitch,
        }


def noise_budget(params: TFHEParams) -> NoiseBudget:
    p = params
    var_fresh = 2.0 * p.alpha_lv0**2
    var_rounding = (p.n + 1) * (2.0 ** (-2 * (p.nbit + 2))) / 3.0

    eps = 2.0 ** -(p.l * p.bgbit)  # uncentered: biased quirky-mask rounding
    var_step = (
        2.0 * p.l * p.N * (p.bg / 2.0) ** 2 * p.alpha_lv1**2
        + (1.0 + p.N) * eps**2
    )
    var_bootstrap = p.n * var_step

    var_ks = (
        p.N * p.iks_l * p.alpha_lv0**2
        + p.N * (2.0 ** (-2 * (p.iks_basebit * p.iks_l + 1))) / 3.0
    )

    sigma = math.sqrt(var_fresh + var_rounding + var_bootstrap + var_ks)
    return NoiseBudget(
        var_fresh=var_fresh,
        var_rounding=var_rounding,
        var_bootstrap=var_bootstrap,
        var_keyswitch=var_ks,
        sigma_total=sigma,
        margin_sigmas=MARGIN / sigma,
    )


def check_params(params: TFHEParams, min_sigmas: float = 5.0) -> tuple[bool, str]:
    """(ok, message): ok iff the decode margin exceeds ``min_sigmas``.

    5 sigma ~= 3e-7 per-gate failure — comfortably correct at batch 10^5;
    the FAST preset scores ~3.2 sigma here, matching its measured 12/8192
    on-device failures (P ~ 1.5e-3 per gate ~ 3 sigma one-sided)."""
    b = noise_budget(params)
    dominant = max(b.components(), key=lambda k: b.components()[k])
    msg = (
        f"margin {b.margin_sigmas:.1f} sigma (sigma={b.sigma_total:.2e}, "
        f"dominant term: {dominant})"
    )
    return b.margin_sigmas >= min_sigmas, msg
