"""Importance sampling (exponential tilting): unbiasedness + variance win.

The tilted simulator shifts the spot-driving Brownian toward the strike and
reweights by the exact likelihood ratio (ops/simulate.py:
simulate_terminal_tilted). Tests check the estimator against closed-form BS
in the degenerate-GBM limit, against the COS oracle under full SVJ, and that
the variance reduction on deep-OTM contracts is real.
"""

import numpy as np
import pytest

from mcos_tpu.engine.pricer import MonteCarloEngine
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops import simulate
from mcos_tpu.ops.bs import bs_price

SPOT = 22500.0


@pytest.fixture(scope="module")
def gbm():
    return gbm_params(0.2, r=0.065, q=0.012)


def test_deep_otm_call_unbiased_vs_bs(gbm):
    """Strike 35% above spot, 1 month: P(ITM) ~ 1e-6 under plain MC."""
    strike, T = SPOT * 1.35, 1.0 / 12.0
    eng = MonteCarloEngine(gbm, num_paths=100_000, num_steps=32,
                           use_sobol=False)
    res = eng.price_importance(SPOT, strike, T, is_call=True)
    ref = float(bs_price(SPOT, strike, T, 0.065, 0.012, 0.2, True))
    assert res["std_error"] > 0
    assert abs(res["price"] - ref) < max(4 * res["std_error"], 1e-3 * ref)
    # The auto-tilt pushed the cloud up toward the strike.
    assert res["tilt_shift"] > 0


def test_deep_otm_put_unbiased_vs_bs(gbm):
    strike, T = SPOT * 0.70, 1.0 / 12.0
    eng = MonteCarloEngine(gbm, num_paths=100_000, num_steps=32,
                           use_sobol=False)
    res = eng.price_importance(SPOT, strike, T, is_call=False)
    ref = float(bs_price(SPOT, strike, T, 0.065, 0.012, 0.2, False))
    assert abs(res["price"] - ref) < max(4 * res["std_error"], 1e-3 * ref)
    assert res["tilt_shift"] < 0


def test_variance_reduction_on_deep_otm(gbm):
    """IS stderr must beat the plain estimator by a large factor at equal n."""
    T = 1.0 / 12.0
    n = 200_000
    plain = MonteCarloEngine(gbm, num_paths=n, num_steps=32, use_sobol=False,
                             use_control_variate=False)

    # At K = 1.30·S the plain estimator sees literally ZERO ITM paths at this
    # n — it confidently reports 0 ± 0 while the true price is positive. IS
    # prices it with a real error bar. This is the failure mode IS exists for.
    k_extreme = SPOT * 1.30
    res_plain = plain.price(SPOT, k_extreme, T, is_call=True)
    res_is = plain.price_importance(SPOT, k_extreme, T, is_call=True)
    ref = float(bs_price(SPOT, k_extreme, T, 0.065, 0.012, 0.2, True))
    assert res_plain["price"] == 0.0 and res_plain["std_error"] == 0.0
    assert abs(res_is["price"] - ref) < max(4 * res_is["std_error"],
                                            1e-2 * ref)

    # At K = 1.15·S plain MC gets a few hits; IS still wins ≥ 5× on stderr.
    k_mod = SPOT * 1.15
    res_plain = plain.price(SPOT, k_mod, T, is_call=True)
    res_is = plain.price_importance(SPOT, k_mod, T, is_call=True)
    assert res_plain["std_error"] > 0
    assert res_is["std_error"] < 0.2 * res_plain["std_error"]


def test_zero_shift_recovers_plain_estimator(gbm):
    """shift=0 ⇒ all weights are exactly 1 and the law is the nominal one."""
    T = 0.25
    s, v, g, log_w = simulate.simulate_terminal_tilted(
        gbm, SPOT, T, __import__("jax").random.key(0), 0.0,
        num_paths=4096, num_steps=16, antithetic=True, companion=True)
    np.testing.assert_allclose(np.asarray(log_w), 0.0, atol=0.0)
    s2, v2, g2 = simulate.simulate_terminal(
        gbm, SPOT, T, __import__("jax").random.key(0),
        num_paths=4096, num_steps=16, antithetic=True, companion=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-6)


def test_full_svj_tilted_matches_untilted():
    """Under full SVJ (jumps on), the weighted tilted estimator must agree
    with the plain estimator within combined error bars — the LR only
    involves the z₁ stream, so jumps/variance keep their law."""
    svj = SVJParams(kappa=3.0, theta=0.06, xi=0.5, rho=-0.6, v0=0.04,
                    lambda_j=1.5, mu_j=-0.06, sigma_j=0.12)
    strike, T = SPOT * 1.15, 0.25
    eng = MonteCarloEngine(svj, num_paths=300_000, num_steps=32,
                           use_sobol=False, use_control_variate=False)
    res_plain = eng.price(SPOT, strike, T, is_call=True)
    res_is = eng.price_importance(SPOT, strike, T, is_call=True)
    tol = 4 * np.hypot(res_plain["std_error"], res_is["std_error"])
    assert abs(res_is["price"] - res_plain["price"]) < tol


def test_ess_diagnostic(gbm):
    """Mild tilt ⇒ ESS near n; reported and finite."""
    eng = MonteCarloEngine(gbm, num_paths=50_000, num_steps=16,
                           use_sobol=False)
    res = eng.price_importance(SPOT, SPOT * 1.05, 1.0 / 12.0)
    n_eff_max = 50_000 * 2  # antithetic branches both carry weights
    assert 0 < res["ess"] <= n_eff_max * 1.001
    assert res["ess"] > 0.2 * n_eff_max
