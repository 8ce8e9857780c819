"""Multi-asset SVJ basket engine: degenerate oracles + structure checks."""

import numpy as np
import pytest

from mcos_tpu.engine.basket import BasketEngine
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops.bs import bs_price

SVJ = SVJParams(kappa=3.0, theta=0.04, xi=0.3, rho=-0.5, v0=0.04,
                lambda_j=0.5, mu_j=-0.03, sigma_j=0.05)


def test_single_asset_basket_is_vanilla():
    """A = 1 collapses to the vanilla European; in GBM mode the geometric
    basket control IS the asset, so the CV is exact (beta → 1, se → 0)."""
    p = gbm_params(0.2, r=0.05, q=0.01)
    bk = BasketEngine([p], np.eye(1), num_paths=100_000, num_steps=32, seed=4)
    out = bk.price([100.0], [1.0], 100.0, 0.25)
    ref = float(bs_price(100.0, 100.0, 0.25, 0.05, 0.01, 0.2, True))
    assert out["price"] == pytest.approx(ref, abs=1e-3)
    assert out["std_error"] < 1e-6
    assert out["cv_beta"] == pytest.approx(1.0, abs=1e-3)


def test_identical_fully_correlated_assets_match_one_asset():
    """rho=1 identical GBM assets: the basket is one asset in disguise.
    (GBM mode only — under SVJ the variance/jump shocks are idiosyncratic,
    so perfectly spot-correlated assets still decouple through v.)"""
    p = gbm_params(0.2, r=0.05, q=0.01)
    corr = np.full((3, 3), 1.0)
    bk3 = BasketEngine([p] * 3, corr, num_paths=60_000, num_steps=32,
                       seed=7)
    bk1 = BasketEngine([p], np.eye(1), num_paths=60_000, num_steps=32,
                       seed=7)
    p3 = bk3.price([100.0] * 3, [1 / 3] * 3, 100.0, 0.5)
    p1 = bk1.price([100.0], [1.0], 100.0, 0.5)
    tol = 4 * (p3["std_error"] + p1["std_error"]) + 0.02
    assert abs(p3["price"] - p1["price"]) < tol


def test_basket_call_increases_with_correlation():
    """Higher spot correlation => higher basket vol => richer OTM call."""
    prices = []
    for c in (0.1, 0.9):
        corr = np.eye(3) * (1 - c) + c
        bk = BasketEngine([SVJ] * 3, corr, num_paths=60_000, num_steps=32,
                          seed=4)
        prices.append(bk.price([100.0] * 3, [1 / 3] * 3, 110.0, 0.5)["price"])
    assert prices[1] > prices[0] * 1.3


def test_diversification_discount():
    """An equal-weight basket call is cheaper than the same-notional
    single-asset call when correlation < 1 (vol averaging)."""
    corr = np.eye(4) * 0.7 + 0.3
    bk = BasketEngine([SVJ] * 4, corr, num_paths=60_000, num_steps=32,
                      seed=9)
    basket = bk.price([100.0] * 4, [0.25] * 4, 100.0, 0.5)["price"]
    single = BasketEngine([SVJ], np.eye(1), num_paths=60_000, num_steps=32,
                          seed=9).price([100.0], [1.0], 100.0, 0.5)["price"]
    assert basket < single


# ── Rainbow (best-of / worst-of) and spread options ──────────────────────────
G1 = gbm_params(0.25, r=0.05, q=0.01)
G2 = gbm_params(0.35, r=0.05, q=0.03)
RHO = 0.4


@pytest.fixture(scope="module")
def rainbow_engine():
    corr = np.array([[1.0, RHO], [RHO, 1.0]])
    return BasketEngine([G1, G2], corr, num_paths=150_000, num_steps=32,
                        seed=3)


@pytest.mark.parametrize("kind", ["worst_of", "best_of"])
@pytest.mark.parametrize("is_call", [True, False])
def test_rainbow_matches_stulz_gbm(rainbow_engine, kind, is_call):
    """Degenerate GBM dynamics: MC == Stulz closed form, and the companion
    control (the same payoff on the SAME simulated legs) makes se tiny."""
    from mcos_tpu.ops.rainbow import rainbow_price

    out = rainbow_engine.price_rainbow([100.0, 95.0], 100.0, 0.75,
                                       kind=kind, is_call=is_call)
    ref = rainbow_price(100.0, 95.0, 100.0, 0.75, 0.05, 0.01, 0.03,
                        0.25, 0.35, RHO, kind=kind, is_call=is_call)
    assert out["price"] == pytest.approx(ref, abs=max(5 * out["std_error"],
                                                      0.02))
    assert out["std_error"] < 0.01  # CV is exact in GBM mode
    assert out["cv_beta"] == pytest.approx(1.0, abs=0.05)


def test_rainbow_ordering(rainbow_engine):
    """worst-of call ≤ each single-asset call ≤ best-of call."""
    worst = rainbow_engine.price_rainbow([100.0, 95.0], 100.0, 0.75,
                                         kind="worst_of")["price"]
    best = rainbow_engine.price_rainbow([100.0, 95.0], 100.0, 0.75,
                                        kind="best_of")["price"]
    c1 = float(bs_price(100.0, 100.0, 0.75, 0.05, 0.01, 0.25, True))
    c2 = float(bs_price(95.0, 100.0, 0.75, 0.05, 0.03, 0.35, True))
    assert worst <= min(c1, c2) + 0.02
    assert best >= max(c1, c2) - 0.02
    # max + min = sum parity: c_best + c_worst = c1 + c2.
    assert best + worst == pytest.approx(c1 + c2, abs=0.05)


def test_spread_margrabe_k0(rainbow_engine):
    """K=0 spread call IS the exchange option: exact Margrabe."""
    from mcos_tpu.ops.rainbow import margrabe_exchange

    out = rainbow_engine.price_spread([100.0, 95.0], 0.0, 0.75)
    ref = margrabe_exchange(100.0, 95.0, 0.75, 0.01, 0.03, 0.25, 0.35, RHO)
    assert out["price"] == pytest.approx(ref, abs=max(5 * out["std_error"],
                                                      0.02))
    assert out["std_error"] < 0.01


def test_spread_k_positive_behaves(rainbow_engine):
    """K>0 spread: cheaper than K=0; Margrabe control still cuts variance
    vs the plain estimator."""
    cv = rainbow_engine.price_spread([100.0, 95.0], 5.0, 0.75)
    corr = np.array([[1.0, RHO], [RHO, 1.0]])
    plain = BasketEngine([G1, G2], corr, num_paths=150_000, num_steps=32,
                         seed=3, use_control_variate=False
                         ).price_spread([100.0, 95.0], 5.0, 0.75)
    k0 = rainbow_engine.price_spread([100.0, 95.0], 0.0, 0.75)
    assert cv["price"] < k0["price"]
    assert cv["std_error"] < 0.5 * plain["std_error"]
    assert cv["price"] == pytest.approx(plain["price"],
                                        abs=4 * plain["std_error"])


def test_rainbow_svj_sanity():
    """Full SVJ 3-asset worst-of: plain antithetic (no 2-asset closed form),
    finite, ordered below the 2-asset worst-of on the same pair."""
    corr3 = np.eye(3) * 0.6 + 0.4
    bk3 = BasketEngine([SVJ] * 3, corr3, num_paths=80_000, num_steps=32,
                       seed=6)
    out3 = bk3.price_rainbow([100.0] * 3, 100.0, 0.5, kind="worst_of")
    corr2 = np.eye(2) * 0.6 + 0.4
    bk2 = BasketEngine([SVJ] * 2, corr2, num_paths=80_000, num_steps=32,
                       seed=6)
    out2 = bk2.price_rainbow([100.0] * 2, 100.0, 0.5, kind="worst_of")
    assert np.isfinite(out3["price"]) and out3["price"] > 0
    assert "cv_beta" not in out3  # no 3-asset closed-form control
    assert out3["price"] <= out2["price"] + 3 * (out3["std_error"]
                                                 + out2["std_error"])


def test_implied_correlation_round_trip():
    """Price a basket call at a known flat rho, invert the quote: the
    implied correlation must recover the generating value (CRN paths make
    the price monotone and smooth in rho, so bisection is clean)."""
    from mcos_tpu.engine.basket import implied_correlation

    gp = [gbm_params(s, r=0.05, q=0.01) for s in (0.2, 0.25, 0.3)]
    spots, w = [100.0, 50.0, 200.0], [1 / 3] * 3
    corr = np.full((3, 3), 0.45)
    np.fill_diagonal(corr, 1.0)
    quote = BasketEngine(gp, corr, num_paths=100_000, seed=42).price(
        spots, w, 115.0, 0.5)["price"]
    out = implied_correlation(gp, spots, w, 115.0, 0.5, quote,
                              num_paths=100_000, seed=42)
    assert out["implied_correlation"] == pytest.approx(0.45, abs=0.02)
    # unattainable quotes are rejected, not silently clamped
    with pytest.raises(ValueError):
        implied_correlation(gp, spots, w, 115.0, 0.5, quote * 3.0,
                            num_paths=20_000, seed=42)
