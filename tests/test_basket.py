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
