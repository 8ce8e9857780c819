"""SSVI surface: round-trip fit, ATM/skew closed forms, no-arb detection.

Oracles: exact parameter recovery on synthetic SSVI data; w(0,t) = theta_t
by construction; the closed-form ATM skew rho*theta*phi/2; Gatheral's g(k)
sign on known-good vs crafted-violating parameter sets.
"""

import numpy as np
import pytest

from mcos_tpu.engine.ssvi import (SSVISurface, butterfly_g, calibrate_ssvi,
                                  ssvi_total_variance)

RHO, ETA, GAMMA = -0.7, 1.2, 0.4
MATS = np.array([0.1, 0.25, 0.5, 1.0, 2.0])
THETA = 0.04 * MATS                      # flat 20% ATM vol term structure


def _synthetic_grid():
    spot, r, q = 100.0, 0.05, 0.01
    fwds = spot * np.exp((r - q) * MATS)
    strikes = np.stack([f * np.exp(np.linspace(-0.3, 0.3, 11))
                        for f in fwds])
    k = np.log(strikes / fwds[:, None])
    w = np.asarray(ssvi_total_variance(k, THETA[:, None], RHO, ETA, GAMMA))
    return fwds, strikes, k, np.sqrt(w / MATS[:, None])


def test_fit_recovers_generating_parameters():
    fwds, strikes, _, ivs = _synthetic_grid()
    fit = calibrate_ssvi(MATS, fwds, strikes, ivs)
    assert fit["rho"] == pytest.approx(RHO, abs=2e-3)
    assert fit["eta"] == pytest.approx(ETA, rel=5e-3)
    assert fit["gamma"] == pytest.approx(GAMMA, abs=5e-3)
    assert fit["rmse_total_variance"] < 1e-5
    assert fit["arbitrage"]["butterfly_free"]
    assert fit["arbitrage"]["calendar_free"]


def test_vol_roundtrip_on_grid():
    fwds, strikes, k, ivs = _synthetic_grid()
    surf = calibrate_ssvi(MATS, fwds, strikes, ivs)["surface"]
    for i in (0, 2, 4):
        np.testing.assert_allclose(surf.vol(k[i], MATS[i]), ivs[i],
                                   atol=5e-6)


def test_atm_total_variance_is_theta():
    surf = SSVISurface(MATS, THETA, RHO, ETA, GAMMA)
    np.testing.assert_allclose(
        [float(surf.total_variance(0.0, t)) for t in MATS], THETA,
        rtol=1e-6)


def test_atm_skew_closed_form():
    surf = SSVISurface(MATS, THETA, RHO, ETA, GAMMA)
    T = 0.5
    th = float(surf.theta_at(T))
    dk = 1e-4
    fd = (surf.vol(dk, T) - surf.vol(-dk, T)) / (2 * dk)
    assert surf.atm_skew(T) == pytest.approx(float(fd), rel=1e-3)
    phi = ETA * th ** (-GAMMA)
    assert surf.atm_skew(T) == pytest.approx(
        RHO * th * phi / (2 * np.sqrt(th * T)), rel=1e-9)


def test_theta_interpolation_and_extrapolation():
    surf = SSVISurface(MATS, THETA, RHO, ETA, GAMMA)
    # inside: linear in t; outside: flat variance *rate*.
    assert surf.theta_at(0.75) == pytest.approx(0.04 * 0.75, rel=1e-9)
    assert surf.theta_at(0.05) == pytest.approx(0.04 * 0.05, rel=1e-9)
    assert surf.theta_at(4.0) == pytest.approx(0.04 * 4.0, rel=1e-9)


def test_butterfly_violation_detected():
    # Large eta at high theta with |rho| -> 1 violates Thm 4.2 hard and
    # makes g(k) negative somewhere.
    bad = SSVISurface([1.0], [0.5], -0.99, 4.5, 0.3)
    rep = bad.arbitrage_report()
    assert not rep["butterfly_free"]
    assert rep["thm42_cond2_max"] > 4.0
    good = SSVISurface([1.0], [0.04], -0.7, 1.2, 0.4)
    assert good.arbitrage_report()["butterfly_free"]


def test_calendar_violation_detected():
    dec = SSVISurface([0.5, 1.0], [0.06, 0.04], -0.5, 1.0, 0.4)
    assert not dec.arbitrage_report()["calendar_free"]


def test_g_matches_manual_fd():
    k = np.linspace(-0.5, 0.5, 21)
    g_ad = np.asarray(butterfly_g(k.astype(np.float32), 0.04, RHO, ETA,
                                  GAMMA))
    h = 1e-3

    def w(kk):
        return np.asarray(ssvi_total_variance(kk, 0.04, RHO, ETA, GAMMA))

    wp = (w(k + h) - w(k - h)) / (2 * h)
    wpp = (w(k + h) - 2 * w(k) + w(k - h)) / h**2
    wk = w(k)
    g_fd = ((1 - k * wp / (2 * wk)) ** 2
            - 0.25 * wp**2 * (1 / wk + 0.25) + 0.5 * wpp)
    # f32 AD vs f64 central differences: 2e-2 absolute covers the sharp
    # curvature region around the smile minimum.
    np.testing.assert_allclose(g_ad, g_fd, atol=2e-2)


def test_iv_grid_export_shape_and_consistency():
    surf = SSVISurface(MATS, THETA, RHO, ETA, GAMMA)
    strikes = np.linspace(80, 120, 9)
    grid = surf.iv_grid(100.0, strikes, [0.25, 1.0], 0.05, 0.01)
    assert grid.shape == (2, 9)
    f = 100.0 * np.exp(0.04 * 0.25)
    np.testing.assert_allclose(
        grid[0], surf.vol(np.log(strikes / f), 0.25), rtol=1e-9)


def test_surface_endpoint_ssvi_block():
    """POST /api/surface with fit_ssvi on BS-priced quotes: flat surface,
    near-zero skew, tiny rmse."""
    from mcos_tpu.api.server import handle_surface
    from mcos_tpu.ops.bs import bs_price

    spot, r, q, sigma = 22500.0, 0.065, 0.012, 0.2
    strikes = [spot * m for m in np.linspace(0.9, 1.1, 7)]
    mats = [0.25, 0.5, 1.0]
    calls = [[float(bs_price(spot, k, t, r, q, sigma, True))
              for k in strikes] for t in mats]
    puts = [[float(bs_price(spot, k, t, r, q, sigma, False))
             for k in strikes] for t in mats]
    out = handle_surface({"spot": spot, "strikes": strikes,
                          "maturities": mats, "call_prices": calls,
                          "put_prices": puts, "r": r, "q": q,
                          "fit_sabr": False, "fit_ssvi": True})
    fit = out["ssvi_fit"]
    assert fit["rmse_total_variance"] < 1e-3
    # theta nodes recover the flat sigma^2 * t total variance
    np.testing.assert_allclose(fit["theta"],
                               [sigma**2 * t for t in mats], rtol=0.02)
    assert fit["arbitrage"]["butterfly_free"]
