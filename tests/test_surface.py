"""Surface engine: IV inversion round-trips, SABR fit recovery, spline checks."""

import numpy as np
import pytest
from scipy.stats import norm

from mcos_tpu.engine import surface
from mcos_tpu.ops.bs import bs_price

S, R, Q = 22500.0, 0.065, 0.012


def bs64(S_, K, T, r, q, sigma, is_call=True):
    """f64 quote generator: market prices carry more precision than f32
    (deep-ITM extrinsic value would be destroyed by an f32 round-trip)."""
    d1 = (np.log(S_ / K) + (r - q + 0.5 * sigma**2) * T) / (sigma * np.sqrt(T))
    d2 = d1 - sigma * np.sqrt(T)
    if is_call:
        return S_ * np.exp(-q * T) * norm.cdf(d1) - K * np.exp(-r * T) * norm.cdf(d2)
    return K * np.exp(-r * T) * norm.cdf(-d2) - S_ * np.exp(-q * T) * norm.cdf(-d1)


def test_implied_vol_roundtrip():
    for sigma in (0.08, 0.2, 0.45, 1.2):
        for k_mult, T in ((0.9, 0.1), (1.0, 0.25), (1.15, 1.0)):
            K = S * k_mult
            price = bs64(S, K, T, R, Q, sigma, True)
            iv = surface.implied_vol(price, S, K, T, R, Q, True)
            assert iv == pytest.approx(sigma, abs=1e-6)


def test_implied_vol_put_roundtrip():
    price = bs64(S, S * 1.05, 0.3, R, Q, 0.25, False)
    iv = surface.implied_vol(price, S, S * 1.05, 0.3, R, Q, False)
    assert iv == pytest.approx(0.25, abs=1e-6)


def test_implied_vol_none_on_bad_price():
    # Below intrinsic ⇒ no bracket ⇒ None (surface.py:58-66 contract).
    assert surface.implied_vol(-5.0, S, S, 0.25, R, Q, True) is None
    # Above the σ=5 upper bracket.
    assert surface.implied_vol(S * 0.999, S, S, 0.01, R, Q, True) is None


def test_implied_vol_grid_vectorized():
    strikes = np.linspace(0.85, 1.15, 7) * S
    sigmas = np.linspace(0.15, 0.3, 7)
    prices = np.array([bs64(S, k, 0.25, R, Q, sg, True)
                       for k, sg in zip(strikes, sigmas)])
    ivs = np.asarray(surface.implied_vol_grid(prices, S, strikes, 0.25, R, Q))
    np.testing.assert_allclose(ivs, sigmas, atol=1e-6)


def test_extract_iv_surface_with_liquidity_filter():
    strikes = np.linspace(0.9, 1.1, 5) * S
    mats = np.array([0.1, 0.3])
    sigma = 0.2
    calls = np.array([[bs64(S, k, t, R, Q, sigma, True)
                       for k in strikes] for t in mats])
    puts = np.array([[bs64(S, k, t, R, Q, sigma, False)
                      for k in strikes] for t in mats])
    spreads = np.full_like(calls, 1.0)
    spreads[0, 0] = 1e9  # illiquid quote
    out = surface.extract_iv_surface(S, R, Q, strikes, mats, calls, puts,
                                     bid_ask_spreads=spreads)
    assert not out["valid_mask"][0, 0]
    assert np.isnan(out["iv_call"][0, 0])
    ok = out["valid_mask"]
    np.testing.assert_allclose(out["iv_call"][ok], sigma, atol=1e-6)
    np.testing.assert_allclose(out["iv_put"][ok], sigma, atol=1e-6)


def test_sabr_atm_limit_continuous():
    v_atm = float(surface.sabr_vol(100.0, 100.0, 0.5, 0.3, 0.8, -0.3, 0.6))
    v_near = float(surface.sabr_vol(100.0, 100.0001, 0.5, 0.3, 0.8, -0.3, 0.6))
    assert v_atm == pytest.approx(v_near, rel=1e-4)
    assert 0.1 < v_atm < 1.0


def test_sabr_skew_sign():
    # Negative rho ⇒ downside strikes carry higher IV.
    lo = float(surface.sabr_vol(100.0, 80.0, 0.5, 0.3, 0.8, -0.6, 0.6))
    hi = float(surface.sabr_vol(100.0, 120.0, 0.5, 0.3, 0.8, -0.6, 0.6))
    assert lo > hi


def test_sabr_calibration_recovers_params():
    F, T = 22500.0, 0.25
    true = dict(alpha=1.1, beta=0.8, rho=-0.4, nu=1.2)
    strikes = np.linspace(0.85, 1.15, 11) * F
    ivs = np.asarray(surface.sabr_vol(F, strikes, T, **true))
    fit = surface.calibrate_sabr(F, strikes, T, ivs, beta_fixed=0.8,
                                 iters=200)
    model = np.asarray(surface.sabr_vol(
        F, strikes, T, fit["alpha"], fit["beta"], fit["rho"], fit["nu"]))
    assert fit["error"] < 1e-5
    np.testing.assert_allclose(model, ivs, atol=5e-3)


def test_spline_fit_and_interp():
    strikes = np.linspace(0.8, 1.2, 9) * S
    mats = np.array([0.1, 0.25, 0.5])
    # Smooth smile, no arbitrage: σ(K) = 0.2 + curvature, σ²T increasing.
    base = 0.2 + 0.5 * ((strikes / S) - 1.0) ** 2
    iv = np.stack([base, base * 1.02, base * 1.05])
    spl = surface.ArbitrageFreeSpline()
    report = spl.fit(strikes, mats, iv)
    assert report["num_maturities_fitted"] == 3
    assert report["is_arbitrage_free"]
    # Knot interpolation and cross-maturity total-variance interpolation.
    assert spl.get_iv(S, 0.25) == pytest.approx(base[4] * 1.02, rel=1e-3)
    mid = spl.get_iv(S, 0.375)
    tv1 = (base[4] * 1.02) ** 2 * 0.25
    tv2 = (base[4] * 1.05) ** 2 * 0.5
    expect = np.sqrt((0.5 * tv1 + 0.5 * tv2) / 0.375)
    assert mid == pytest.approx(expect, rel=1e-3)


def test_spline_flags_calendar_arbitrage():
    strikes = np.linspace(0.8, 1.2, 9) * S
    mats = np.array([0.1, 0.5])
    iv = np.stack([np.full(9, 0.4), np.full(9, 0.1)])  # σ²T collapses
    spl = surface.ArbitrageFreeSpline()
    report = spl.fit(strikes, mats, iv)
    assert any(v["type"] == "calendar" for v in report["violations"])
    assert not report["is_arbitrage_free"]


def test_spline_flags_butterfly():
    # Moneyness-scale strikes: with rupee-scale strikes d²σ/dK² ~ 1e-9 never
    # crosses the −1e-6 threshold (true of the reference too, surface.py:295).
    strikes = np.linspace(0.8, 1.2, 9)
    # Concave IV hump ⇒ d²σ/dK² < 0 somewhere.
    iv = (0.3 - 0.8 * (strikes - 1.0) ** 2)[None, :]
    spl = surface.ArbitrageFreeSpline()
    report = spl.fit(strikes, np.array([0.25]), iv)
    assert any(v["type"] == "butterfly" for v in report["violations"])


def test_natural_spline_matches_scipy():
    from scipy.interpolate import CubicSpline
    x = np.array([1.0, 2.0, 3.5, 5.0, 7.0])
    y = np.array([0.5, 0.1, 0.4, 0.2, 0.9])
    ours = surface.NaturalCubicSpline(x, y)
    ref = CubicSpline(x, y, bc_type="natural")
    xq = np.linspace(1.0, 7.0, 50)
    np.testing.assert_allclose(ours(xq), ref(xq), atol=1e-10)
    np.testing.assert_allclose(ours(xq, 1), ref(xq, 1), atol=1e-9)
    np.testing.assert_allclose(ours(xq, 2), ref(xq, 2), atol=1e-9)


# ── American implied vol (de-Americanization) ────────────────────────────────
def test_american_iv_roundtrip():
    """Price from the CRR tree at a known σ, invert, recover σ."""
    from mcos_tpu.engine.american import binomial_american_bs
    from mcos_tpu.engine.surface import implied_vol_american

    S, K, T, r, q, sigma = 1000.0, 1050.0, 0.25, 0.065, 0.012, 0.28
    price = binomial_american_bs(S, K, T, r, q, sigma, steps=256,
                                 is_call=False)
    iv = implied_vol_american(price, S, K, T, r, q, is_call=False)
    assert iv == pytest.approx(sigma, abs=1e-5)


def test_american_iv_below_european_for_itm_put():
    """An American ITM put quote carries an early-exercise premium; the
    European inversion books it as extra vol. The de-Americanized IV must
    sit strictly below the European one (and equal the generating σ)."""
    from mcos_tpu.engine.american import binomial_american_bs
    from mcos_tpu.engine.surface import implied_vol, implied_vol_american

    S, K, T, r, q, sigma = 1000.0, 1200.0, 0.5, 0.08, 0.0, 0.25
    quote = binomial_american_bs(S, K, T, r, q, sigma, steps=512,
                                 is_call=False)
    iv_am = implied_vol_american(quote, S, K, T, r, q, is_call=False,
                                 steps=512)
    iv_eu = implied_vol(quote, S, K, T, r, q, is_call=False)
    assert iv_am == pytest.approx(sigma, abs=2e-4)
    assert iv_eu is not None and iv_eu > iv_am + 0.01


def test_american_call_no_dividend_matches_european_iv():
    """With q=0 an American call is never exercised early — both
    inversions must agree."""
    from mcos_tpu.ops.bs import bs_price
    from mcos_tpu.engine.surface import implied_vol, implied_vol_american

    S, K, T, r, sigma = 1000.0, 1000.0, 0.25, 0.065, 0.2
    quote = float(bs_price(S, K, T, r, 0.0, sigma, True))
    iv_am = implied_vol_american(quote, S, K, T, r, 0.0, is_call=True)
    iv_eu = implied_vol(quote, S, K, T, r, 0.0, is_call=True)
    assert iv_am == pytest.approx(iv_eu, abs=2e-3)
    assert iv_am == pytest.approx(sigma, abs=2e-3)


def test_american_iv_failure_contract():
    from mcos_tpu.engine.surface import implied_vol_american

    # Below intrinsic → no bracket → None (reference Optional contract).
    assert implied_vol_american(10.0, 1000.0, 1200.0, 0.25, 0.065, 0.0,
                                is_call=False) is None
    assert implied_vol_american(-5.0, 1000.0, 1000.0, 0.25, 0.065, 0.0) is None


def test_extract_surface_american_mode():
    """Grid extraction in american mode recovers a flat σ surface from CRR
    prices and rejects an unknown style."""
    import numpy as np

    from mcos_tpu.engine.american import binomial_american_bs
    from mcos_tpu.engine.surface import extract_iv_surface

    S, r, q, sigma = 1000.0, 0.065, 0.012, 0.22
    strikes = np.array([950.0, 1000.0, 1050.0])
    mats = np.array([0.1, 0.25])
    calls = np.array([[binomial_american_bs(S, k, t, r, q, sigma, 256, True)
                       for k in strikes] for t in mats])
    puts = np.array([[binomial_american_bs(S, k, t, r, q, sigma, 256, False)
                      for k in strikes] for t in mats])
    surf = extract_iv_surface(S, r, q, strikes, mats, calls, puts,
                              exercise="american")
    assert np.allclose(surf["iv_call"], sigma, atol=1e-4)
    assert np.allclose(surf["iv_put"], sigma, atol=1e-4)
    with pytest.raises(ValueError):
        extract_iv_surface(S, r, q, strikes, mats, calls, puts,
                           exercise="bermudan")
