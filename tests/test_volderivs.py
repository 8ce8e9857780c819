"""Volatility derivatives (engine/volderivs.py).

Oracles: the SVJ variance-swap closed form (CIR mean integral + jump second
moment), the exact CIR noncentral-χ² terminal law for VIX products, Jensen
orderings, and degenerate-GBM determinism.
"""

import math

import numpy as np
import pytest

from mcos_tpu.engine.exotics import variance_swap_fair_strike
from mcos_tpu.engine.volderivs import (VolDerivsEngine, cir_terminal_law,
                                       vix_squared_coefficients)
from mcos_tpu.models.params import SVJParams, gbm_params

HESTON = SVJParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.6, v0=0.09,
                   lambda_j=0.0, r=0.06, q=0.0)
SVJ = SVJParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.6, v0=0.09,
                lambda_j=0.8, mu_j=-0.06, sigma_j=0.12, r=0.06, q=0.0)
T = 1.0


@pytest.fixture(scope="module")
def eng():
    return VolDerivsEngine(SVJ, num_paths=150_000, num_steps=252, seed=3)


# ── coefficients ─────────────────────────────────────────────────────────────
def test_vix_coefficients_limits():
    # v0 == theta, no jumps → VIX² = theta for any kappa.
    p = SVJParams(kappa=2.0, theta=0.04, v0=0.04, xi=0.3, lambda_j=0.0)
    co = vix_squared_coefficients(p, convention="log_contract")
    assert co["a"] + co["b"] * 0.04 == pytest.approx(0.04, rel=1e-12)
    # kappa → large: b = 1/(kappa·tau) → 0, a → theta (+jump).
    p2 = SVJParams(kappa=5000.0, theta=0.04, v0=0.09, lambda_j=0.0)
    co2 = vix_squared_coefficients(p2)
    assert co2["b"] == pytest.approx(1.0 / (5000.0 * 30 / 365), rel=1e-2)
    assert co2["a"] == pytest.approx(0.04, rel=0.01)


def test_jump_addon_conventions():
    lc = vix_squared_coefficients(SVJ, convention="log_contract")
    qv = vix_squared_coefficients(SVJ, convention="quadratic_variation")
    k_bar = math.exp(-0.06 + 0.5 * 0.12**2) - 1.0
    assert lc["jump_addon"] == pytest.approx(0.8 * 2 * (k_bar + 0.06))
    assert qv["jump_addon"] == pytest.approx(0.8 * (0.06**2 + 0.12**2))
    # QV add-on matches the variance-swap closed form's jump leg.
    assert qv["jump_addon"] == pytest.approx(
        variance_swap_fair_strike(SVJ, T)["jump_leg"])


def test_cir_law_mean_variance():
    """ncx2 mean/var must reproduce the CIR moments."""
    from scipy.stats import ncx2

    law = cir_terminal_law(HESTON, T)
    mean = law["scale"] * ncx2.mean(law["df"], law["nc"])
    var = law["scale"] ** 2 * ncx2.var(law["df"], law["nc"])
    kappa, theta, xi, v0 = 2.0, 0.04, 0.5, 0.09
    ekt = math.exp(-kappa * T)
    m_ref = theta + (v0 - theta) * ekt
    v_ref = (v0 * xi**2 * ekt * (1 - ekt) / kappa
             + theta * xi**2 * (1 - ekt) ** 2 / (2 * kappa))
    assert mean == pytest.approx(m_ref, rel=1e-10)
    assert var == pytest.approx(v_ref, rel=1e-10)


# ── variance / vol swaps ─────────────────────────────────────────────────────
def test_variance_swap_mc_pins_closed_form(eng):
    out = eng.variance_swap(T)
    # Euler discretization bias at 252 steps/yr is well inside a few MC σ.
    assert out["mc_vs_closed_sigmas"] < 4.0
    assert out["fair_variance"] == pytest.approx(
        out["diffusion_leg"] + out["jump_leg"])


def test_stderr_pools_antithetic_pairs(eng):
    """Regression: the stderr must be computed over iid antithetic PAIR
    means — branch members share jump draws and z² magnitudes, so they are
    dependent and the √(2n)-flattened formula is wrong by √(1+ρ) in either
    direction (ρ ≈ −0.29 at these SVJ params, +0.05 in GBM-like regimes)."""
    rv = eng._rv(T)
    assert rv.shape == (2, eng.num_paths)   # branch axis preserved
    corr = np.corrcoef(rv[0], rv[1])[0, 1]
    assert abs(corr) > 0.02                 # branches are NOT independent
    pairs = rv.mean(axis=0)
    se_pairs = pairs.std() / np.sqrt(pairs.size)
    se_flat = rv.reshape(-1).std() / np.sqrt(rv.size)
    out = eng.variance_swap(T)
    assert out["mc_std_error"] == pytest.approx(se_pairs, rel=1e-9)
    # flattening is off by exactly √(1+ρ): se_pairs = se_flat·√(1+ρ)
    assert se_pairs == pytest.approx(se_flat * np.sqrt(1.0 + corr), rel=5e-3)


def test_vol_swap_jensen_and_convexity(eng):
    out = eng.vol_swap(T)
    # K_vol ≤ √K_var strictly (Jensen), gap > 0 beyond MC noise.
    assert out["convexity_discount"] > 3 * out["std_error"]
    # Brockhaus-Long is a good first-order estimate of the MC value.
    assert out["brockhaus_long"] == pytest.approx(out["fair_vol_strike"],
                                                  abs=0.01)


def test_vol_swap_degenerate_gbm_is_sigma():
    """Constant variance: E[RV/T] = σ² exactly; the only convexity left is
    the discrete-sampling χ² effect, Var(RV)/(8m^{3/2}) = σ·/(8·n/2)... ≈
    σ/(4n) ≈ 5e-4 at n=128 observations — small and positive."""
    eng = VolDerivsEngine(gbm_params(0.25, r=0.06, q=0.0),
                          num_paths=20_000, num_steps=128, seed=1)
    out = eng.vol_swap(0.5)
    n_obs = 64  # scaled_steps(128, 0.5)
    chi2_discount = 0.25 * 2 / (8.0 * n_obs)  # σ·Var(χ²ₙ/n)/(8) in vol units
    assert out["fair_vol_strike"] == pytest.approx(0.25 - chi2_discount,
                                                   abs=2e-3)
    assert 0.0 < out["convexity_discount"] < 5e-3


# ── VIX products ─────────────────────────────────────────────────────────────
def test_vix_future_jensen_and_mean_reversion(eng):
    out = eng.vix_future(T)
    assert out["future"] < out["jensen_upper_bound"]
    # v0 > theta → the future sits below today's VIX (mean reversion pulls
    # variance down).
    assert out["future"] < out["vix_spot"]
    # And above the infinite-horizon floor √(a+b·theta) region — sanity.
    co = vix_squared_coefficients(SVJ)
    assert out["future"] > 0.9 * math.sqrt(co["a"] + co["b"] * 0.04)


def test_vix_future_matches_qe_mc(eng):
    quad = eng.vix_future(T)["future"]
    mc = eng.vix_future_mc(T, num_steps=64)
    # QE variance transitions are near-exact; 4σ band plus a small scheme
    # tolerance.
    assert abs(mc["future_mc"] - quad) < 4 * mc["std_error"] + 2e-3


def test_vix_option_parity_and_monotonicity(eng):
    fut = eng.vix_future(T)["future"]
    for k in (0.15, 0.22, 0.30):
        call = eng.vix_option(T, k, is_call=True)
        put = eng.vix_option(T, k, is_call=False)
        df = call["discount_factor"]
        assert call["price"] - put["price"] == pytest.approx(
            df * (fut - k), abs=1e-10)
    c1 = eng.vix_option(T, 0.15)["price"]
    c2 = eng.vix_option(T, 0.25)["price"]
    assert c1 > c2 > 0


def test_vix_deterministic_degenerate():
    eng = VolDerivsEngine(gbm_params(0.2, r=0.06, q=0.0), num_paths=1000)
    out = eng.vix_future(0.5)
    assert out["future"] == pytest.approx(0.2, rel=1e-6)
    opt = eng.vix_option(0.5, 0.15, is_call=True)
    assert opt["price"] == pytest.approx(
        opt["discount_factor"] * 0.05, rel=1e-6)


# ── API ──────────────────────────────────────────────────────────────────────
def test_api_volderivs_endpoint():
    from mcos_tpu.api.server import ApiError, handle_volderivs

    p = {"kappa": 2.0, "theta": 0.04, "xi": 0.5, "rho": -0.6, "v0": 0.09,
         "lambda_j": 0.8, "mu_j": -0.06, "sigma_j": 0.12, "r": 0.06,
         "q": 0.0}
    vs = handle_volderivs({"kind": "variance_swap", "T": 1.0, "params": p,
                           "num_paths": 30_000})
    assert vs["mc_vs_closed_sigmas"] < 6.0
    fut = handle_volderivs({"kind": "vix_future", "T": 1.0, "params": p})
    assert 0.1 < fut["future"] < 0.5
    opt = handle_volderivs({"kind": "vix_option", "T": 1.0, "strike": 0.22,
                            "params": p})
    assert opt["price"] > 0
    with pytest.raises(ApiError):
        handle_volderivs({"kind": "vix_option", "T": 1.0, "params": p})
