"""COS/Bates semi-analytic pricer: BS limit, parity, and the decisive
cross-check — full-SVJ Monte Carlo vs the characteristic-function price."""

import numpy as np
import pytest

from mcos_tpu.engine.pricer import MonteCarloEngine
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops.bs import bs_price
from mcos_tpu.ops.cos_pricer import cos_price, heston_price

S, T = 22500.0, 0.25
R, Q = 0.065, 0.012


def test_cos_degenerate_matches_bs():
    """ξ→0, λ=0, κ=0 ⇒ Bates = Black-Scholes."""
    p = gbm_params(0.2, r=R, q=Q).replace(xi=1e-6, kappa=1e-6)
    strikes = np.linspace(0.85, 1.15, 7) * S
    cos = cos_price(p, S, strikes, T, True)
    bs = np.array([float(bs_price(S, k, T, R, Q, 0.2, True))
                   for k in strikes])
    np.testing.assert_allclose(cos, bs, rtol=5e-4)


def test_cos_put_call_parity():
    p = SVJParams(kappa=2.0, theta=0.05, xi=0.5, rho=-0.6, v0=0.04,
                  lambda_j=1.5, mu_j=-0.07, sigma_j=0.12, r=R, q=Q)
    strikes = np.array([0.9, 1.0, 1.1]) * S
    calls = cos_price(p, S, strikes, T, True)
    puts = cos_price(p, S, strikes, T, False)
    parity = S * np.exp(-Q * T) - strikes * np.exp(-R * T)
    np.testing.assert_allclose(calls - puts, parity, atol=1e-6 * S)


def test_cos_pure_heston_vs_literature():
    """Heston benchmark: κ=2, θ=0.04? Use a self-consistency check instead —
    price decreases in strike and increases in v0, and the ATM value sits
    between BS at √θ and BS at √v0 extremes for long maturity."""
    p = SVJParams(kappa=2.0, theta=0.09, xi=0.4, rho=-0.5, v0=0.04,
                  lambda_j=0.0, mu_j=0.0, sigma_j=0.01, r=0.03, q=0.0)
    strikes = np.linspace(0.8, 1.2, 9) * 100.0
    prices = heston_price(p, 100.0, strikes, 1.0, True)
    assert np.all(np.diff(prices) < 0)
    bs_lo = float(bs_price(100.0, 100.0, 1.0, 0.03, 0.0, 0.2, True))
    bs_hi = float(bs_price(100.0, 100.0, 1.0, 0.03, 0.0, 0.3, True))
    assert bs_lo < prices[4] < bs_hi


def test_mc_matches_cos_full_svj():
    """THE oracle test: the MC engine must reproduce the semi-analytic
    Bates price on full SVJ dynamics within discretization + MC bands.

    (The reference can only check its engine against BS in a degenerate
    limit — verify.py:29-42; this validates the entire SVJ machinery:
    Heston variance process, correlation, jumps, compensator.)
    """
    p = SVJParams(kappa=3.0, theta=0.06, xi=0.5, rho=-0.7, v0=0.04,
                  lambda_j=1.5, mu_j=-0.07, sigma_j=0.12, r=R, q=Q)
    strikes = np.array([0.9, 0.95, 1.0, 1.05, 1.1], np.float32) * S
    exact = cos_price(p, S, strikes, T, True)

    eng = MonteCarloEngine(p, num_paths=400_000, num_steps=1024,
                           use_sobol=False, seed=3)
    mc = eng.price_batch(S, strikes, T)
    for i, row in enumerate(mc):
        # 4σ MC band + 0.15% discretization allowance (Euler at dt=T/256).
        tol = 4 * row["std_error"] + 0.0015 * exact[i]
        assert abs(row["price"] - exact[i]) < tol, (
            f"K={strikes[i]}: MC={row['price']:.3f} COS={exact[i]:.3f} "
            f"tol={tol:.3f}")


def test_mc_matches_cos_puts():
    p = SVJParams(kappa=2.5, theta=0.05, xi=0.4, rho=-0.5, v0=0.05,
                  lambda_j=1.0, mu_j=-0.05, sigma_j=0.10, r=R, q=Q)
    strike = S * 1.05
    exact = float(cos_price(p, S, [strike], T, False)[0])
    eng = MonteCarloEngine(p, num_paths=400_000, num_steps=1024,
                           use_sobol=False, seed=4)
    res = eng.price(S, strike, T, is_call=False)
    assert abs(res["price"] - exact) < 4 * res["std_error"] + 0.0015 * exact


# ── Risk-neutral density (exact Breeden–Litzenberger) ───────────────────────
def test_cos_density_is_a_density():
    """Integrates to 1, nonnegative, and carries the forward as its mean."""
    from mcos_tpu.ops.cos_pricer import cos_density

    p = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                  lambda_j=1.0, mu_j=-0.05, sigma_j=0.10)
    spot, T = 22500.0, 0.25
    s, pdf = cos_density(p, spot, T, n_points=1001)
    assert np.all(pdf >= 0)
    mass = np.trapezoid(pdf, s)
    assert mass == pytest.approx(1.0, abs=2e-3)
    mean = np.trapezoid(s * pdf, s)
    fwd = spot * np.exp((float(p.r) - float(p.q)) * T)
    assert mean == pytest.approx(fwd, rel=2e-3)


def test_cos_density_gbm_is_lognormal():
    from mcos_tpu.ops.cos_pricer import cos_density

    sigma, r, q, spot, T = 0.2, 0.065, 0.012, 22500.0, 0.5
    # ξ/κ floors: the Heston CF divides by ξ² and by β±d (β = 0 at u=0
    # when κ=ρ=0) — same floors the static-hedge valuation leg uses.
    s, pdf = cos_density(gbm_params(sigma, r=r, q=q).replace(xi=1e-4,
                                                             kappa=1e-6),
                         spot, T, n_points=501)
    mu = np.log(spot) + (r - q - 0.5 * sigma**2) * T
    sd = sigma * np.sqrt(T)
    ref = np.exp(-0.5 * ((np.log(s) - mu) / sd) ** 2) / (
        s * sd * np.sqrt(2 * np.pi))
    core = ref > ref.max() * 1e-3
    assert np.allclose(pdf[core], ref[core], rtol=2e-3, atol=ref.max() * 1e-5)


def test_cos_density_matches_breeden_litzenberger():
    """f(K) = e^{rT}·∂²C/∂K² — the density must agree with a central second
    difference of the exact COS call prices."""
    from mcos_tpu.ops.cos_pricer import cos_density

    p = SVJParams(kappa=2.0, theta=0.05, xi=0.5, rho=-0.5, v0=0.04,
                  lambda_j=0.8, mu_j=-0.06, sigma_j=0.12)
    spot, T = 22500.0, 0.25
    ks = np.array([0.92, 1.0, 1.08]) * spot
    h = 5.0
    _, pdf = cos_density(p, spot, T, s_grid=ks)
    for k, f in zip(ks, pdf):
        c = cos_price(p, spot, np.array([k - h, k, k + h]), T, True)
        bl = np.exp(float(p.r) * T) * (c[0] - 2 * c[1] + c[2]) / (h * h)
        assert f == pytest.approx(bl, rel=2e-3)
