"""Rough Heston: fractional-Riccati CF limits, COS oracle, lifted-kernel
fit, and the MC-vs-oracle cross-check — the same validation ladder the
SVJ/SVCJ/rough-Bergomi stacks get."""

import numpy as np
import pytest

from mcos_tpu.engine.roughheston import (
    RoughHestonEngine,
    calibrate_rough_heston,
)
from mcos_tpu.models.params import SVJParams
from mcos_tpu.ops.cos_pricer import bates_cf, cos_price
from mcos_tpu.ops.roughheston import (
    RoughHestonParams,
    lifted_kernel_error,
    lifted_kernel_nodes,
    rough_heston_cf,
    rough_heston_cos_price,
)

S, T = 22500.0, 0.25

P = RoughHestonParams(lam=1.5, theta=0.04, nu=0.35, rho=-0.7, v0=0.04,
                      hurst=0.1)
# H = 1/2 instance and its classical-Heston twin (kappa=lam, xi=nu).
P_HALF = RoughHestonParams(lam=3.0, theta=0.04, nu=0.5, rho=-0.7, v0=0.04,
                           hurst=0.5)
SVJ_TWIN = SVJParams(kappa=3.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04,
                     lambda_j=0.0)


def test_cf_reduces_to_heston_at_half():
    """alpha = 1 turns the fractional Riccati into the classical Heston
    ODE: the Adams solve must land on the little-trap CF."""
    u = np.linspace(0.1, 80.0, 15)
    lhs = rough_heston_cf(u, P_HALF, T, S, n_steps=400)
    rhs = bates_cf(u, SVJ_TWIN, T, S)
    np.testing.assert_allclose(lhs, rhs, rtol=2e-4)


def test_cos_reduces_to_heston_price_at_half():
    strikes = np.array([0.9, 1.0, 1.1]) * S
    lhs = rough_heston_cos_price(P_HALF, S, strikes, T, True, n_steps=400)
    rhs = cos_price(SVJ_TWIN, S, strikes, T, True)
    np.testing.assert_allclose(lhs, rhs, rtol=5e-4)


def test_cos_put_call_parity():
    strikes = np.array([0.85, 1.0, 1.15]) * S
    calls = rough_heston_cos_price(P, S, strikes, T, True)
    puts = rough_heston_cos_price(P, S, strikes, T, False)
    parity = S * np.exp(-float(P.q) * T) - strikes * np.exp(-float(P.r) * T)
    np.testing.assert_allclose(calls - puts, parity, atol=1e-6 * S)


def test_cos_adams_step_converged():
    """The default Adams discretization is converged: doubling the steps
    moves the smile by < 2e-4 relative (0.014 ATM rupees measured)."""
    strikes = np.array([0.9, 1.0, 1.1]) * S
    a = rough_heston_cos_price(P, S, strikes, T, True, n_steps=256)
    b = rough_heston_cos_price(P, S, strikes, T, True, n_steps=512)
    np.testing.assert_allclose(a, b, rtol=2e-4)


def test_short_dated_skew_explodes_like_power_law():
    """|ATM skew| ~ T^(H-1/2): the defining rough signature. Between
    T = 0.4 and T = 0.025 the skew must steepen close to the power law
    (band matches the rBergomi test's tolerance philosophy)."""
    eng = RoughHestonEngine(P, num_paths=1000, num_steps=512)
    res = eng.atm_skew_term_structure(S, [0.025, 0.4])
    rows = {r["T"]: r["atm_skew"] for r in res["rows"]}
    assert set(rows) == {0.025, 0.4}
    ratio = abs(rows[0.025]) / abs(rows[0.4])
    expected = (0.025 / 0.4) ** (P.hurst - 0.5)   # ~ 3.0 at H = 0.1
    assert rows[0.025] < 0.0                       # negative skew (rho<0)
    assert 0.55 * expected < ratio < 1.6 * expected


def test_lifted_kernel_fit_quality():
    """Moment-matched exponential sum tracks the power kernel to < 1%
    sup relative error on [resolution, T] across the H range."""
    for h in (0.05, 0.1, 0.2, 0.4):
        err = lifted_kernel_error(h, T, T / 256)
        assert err < 0.01, (h, err)


def test_lifted_kernel_degenerates_at_half():
    c, x = lifted_kernel_nodes(0.5, T, T / 256)
    assert c == (1.0,) and x == (0.0,)


def test_mc_matches_cos_oracle():
    """THE oracle test for the family: lifted MC vs the fractional-
    Riccati COS price. Band = 4 sigma + 0.6% discretization allowance
    (the measured O(dt) weak error of the semi-implicit scheme at this
    oversampling — larger than the SVJ/SVCJ Euler allowance because
    H = 0.1 variance paths are genuinely rougher)."""
    strikes = np.array([0.9, 1.0, 1.1]) * S
    exact = rough_heston_cos_price(P, S, strikes, T, True)
    eng = RoughHestonEngine(P, num_paths=60_000, num_steps=8192, seed=3)
    res = eng.mc_vs_cos(S, strikes, T, True)
    assert res["kernel_fit_error"] < 0.01
    for row, ex in zip(res["rows"], exact):
        tol = 4.0 * row["std_error"] + 0.006 * ex
        assert abs(row["mc_price"] - ex) < tol, (row, ex, tol)


def test_mc_half_hurst_matches_heston():
    """H = 1/2 collapses the lift to single-factor classical Euler: the
    engine must reprice the Heston COS twin."""
    strikes = np.array([1.0]) * S
    exact = cos_price(SVJ_TWIN.replace(kappa=1.5, xi=0.35), S, strikes, T,
                      True)
    eng = RoughHestonEngine(P_HALF.replace(lam=1.5, nu=0.35),
                            num_paths=80_000, num_steps=2048, seed=1)
    out = eng.price(S, float(strikes[0]), T, True)
    assert abs(out["price"] - exact[0]) < 4 * out["std_error"] \
        + 0.004 * exact[0]


def test_ad_greeks_sane_and_match_fd_delta():
    """AD delta (the stable pathwise chain) + CRN-FD sensitivities; the
    AD delta must agree with its own CRN finite difference."""
    eng = RoughHestonEngine(P, num_paths=40_000, num_steps=1024, seed=9)
    g = eng.greeks(S, S, T, True)
    assert 0.3 < g["delta"] < 0.8
    assert g["vega"] > 0.0
    assert g["dP_drho"] != 0.0
    # CRN-FD cross-check of the AD delta (same seed both sides).
    h = 0.01 * S
    up = RoughHestonEngine(P, num_paths=40_000, num_steps=1024,
                           seed=9).price(S + h, S, T, True)["price"]
    dn = RoughHestonEngine(P, num_paths=40_000, num_steps=1024,
                           seed=9).price(S - h, S, T, True)["price"]
    fd = (up - dn) / (2 * h)
    assert abs(g["delta"] - fd) < 0.03


def test_calibration_roundtrip():
    """Recover (nu, rho, v0) from COS prices generated by known params at
    fixed H — exact objective, so the fit must land on the truth."""
    strikes = np.array([0.92, 0.96, 1.0, 1.04, 1.08]) * S
    market = rough_heston_cos_price(P, S, strikes, T, True,
                                    n_terms=192, n_steps=128)
    fit = calibrate_rough_heston(S, strikes, T, market, hurst=0.1,
                                 n_starts=1)
    assert fit["rmse_price"] < 0.5
    assert abs(fit["nu"] - 0.35) < 0.05
    assert abs(fit["rho"] + 0.7) < 0.08
    assert abs(fit["v0"] - 0.04) < 0.004


def test_api_roughheston_modes():
    from mcos_tpu.api import server as api

    base = {"spot": S, "T": T, "num_paths": 2_000, "num_steps": 2048,
            "n_factors": 8}
    out = api.handle_roughheston(dict(base))
    assert out["price"] > 0 and out["n_factors"] == 8
    g = api.handle_roughheston({**base, "mode": "greeks"})
    assert "delta" in g and "dP_dnu" in g
    sm = api.handle_roughheston({**base, "mode": "smile",
                                 "strikes": [0.95 * S, S, 1.05 * S]})
    assert len(sm["iv"]) == 3 and sm["iv"][0] > sm["iv"][2]
    sk = api.handle_roughheston({**base, "mode": "skew",
                                 "maturities": [0.05, 0.25]})
    assert len(sk["rows"]) == 2
    cmp_ = api.handle_roughheston({**base, "mode": "compare"})
    assert len(cmp_["rows"]) == 5
    import pytest as _pytest
    with _pytest.raises(api.ApiError):
        api.handle_roughheston({**base, "mode": "nope"})
    with _pytest.raises(api.ApiError):
        api.handle_roughheston({**base, "mode": "calibrate"})


def test_smile_shape_vs_heston():
    """Roughness redistributes smile mass: at matched (lam, theta, nu,
    rho, v0), H = 0.1 must produce a steeper short-dated OTM-put wing
    than H = 0.5 (classical)."""
    k_put = 0.88 * S
    rough_put = float(rough_heston_cos_price(P, S, [k_put], 0.05, False)[0])
    half_put = float(rough_heston_cos_price(P.replace(hurst=0.5), S,
                                            [k_put], 0.05, False)[0])
    assert rough_put > 1.05 * half_put
