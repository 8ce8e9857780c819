"""Heston-Hull-White hybrid: exact martingale, bond and BS+Vasicek
oracles, Heston/COS limit, AD Greeks vs CRN-FD."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcos_tpu.engine.hhw import HHWEngine
from mcos_tpu.models.params import SVJParams
from mcos_tpu.ops.cos_pricer import heston_price
from mcos_tpu.ops.hhw import (HHWParams, bsm_hullwhite, hhw_terminal,
                              vasicek_bond)

FULL = HHWParams(kappa=2.0, theta=0.05, xi=0.4, v0=0.04, a=0.1, b=0.05,
                 sigma_r=0.012, r0=0.05, rho_sv=-0.6, rho_sr=0.3, q=0.01)
SPOT, K, T = 100.0, 100.0, 2.0


@pytest.fixture(scope="module")
def paths():
    return hhw_terminal(FULL, SPOT, T, jax.random.key(1),
                        num_paths=200_000, num_steps=96)


def test_discounted_spot_is_exact_martingale(paths):
    # Left-point r in both drift and discount cancels pathwise: E[D S_T]
    # = S0 e^{-qT} at ANY step count (the scheme's design invariant).
    s, d = paths
    ds = d * s
    m = float(ds.mean())
    se = float(ds.std()) / np.sqrt(ds.size / 2)
    assert abs(m - SPOT * np.exp(-FULL.q * T)) < 4 * se


def test_zero_coupon_matches_vasicek(paths):
    _, d = paths
    bond = float(d.mean())
    se = float(d.std()) / np.sqrt(d.size / 2)
    # left-point integral bias budget: ~1e-4 relative at 96 steps
    assert abs(bond - vasicek_bond(FULL, T)) < 4 * se + 2e-4


def test_heston_limit_matches_cos():
    p0 = dataclasses.replace(FULL, sigma_r=1e-8, rho_sr=0.0)
    sp = SVJParams(kappa=2.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                   lambda_j=0.0, mu_j=0.0, sigma_j=1e-4, r=0.05, q=0.01)
    ref = float(heston_price(sp, SPOT, [K], T, True)[0])
    s, d = hhw_terminal(p0, SPOT, T, jax.random.key(2),
                        num_paths=200_000, num_steps=96)
    pay = (jnp.maximum(s - K, 0.0) * d).mean(axis=0)
    pr = float(pay.mean())
    se = float(pay.std()) / np.sqrt(pay.shape[0])
    assert abs(pr - ref) < 4 * se + 2e-3 * ref   # Euler bias slack


@pytest.mark.parametrize("rho_sr", [0.0, 0.4, -0.4])
def test_gbm_vasicek_closed_form(rho_sr):
    p = HHWParams(kappa=2.0, theta=0.04, xi=1e-6, v0=0.04, a=0.1, b=0.05,
                  sigma_r=0.015, r0=0.05, rho_sv=0.0, rho_sr=rho_sr,
                  q=0.01)
    ref = bsm_hullwhite(p, SPOT, K, T, 0.2, True)
    s, d = hhw_terminal(p, SPOT, T, jax.random.key(3),
                        num_paths=200_000, num_steps=96)
    pay = (jnp.maximum(s - K, 0.0) * d).mean(axis=0)
    pr = float(pay.mean())
    se = float(pay.std()) / np.sqrt(pay.shape[0])
    assert abs(pr - ref) < 4 * se + 1e-3 * ref


def test_positive_correlation_raises_long_dated_call():
    # rho_sr > 0 adds covariance to the forward's total variance — the
    # closed form says the call must be worth more than at rho_sr < 0.
    lo = bsm_hullwhite(dataclasses.replace(FULL, rho_sr=-0.4), SPOT, K, T,
                       0.2, True)
    hi = bsm_hullwhite(dataclasses.replace(FULL, rho_sr=0.4), SPOT, K, T,
                       0.2, True)
    assert hi > lo


def test_engine_greeks_match_crn_fd():
    eng = HHWEngine(FULL, num_paths=100_000, num_steps=64, seed=1)
    g = eng.greeks(SPOT, K, T)
    h = 0.5
    fd_delta = (eng.price(SPOT + h, K, T)["price"]
                - eng.price(SPOT - h, K, T)["price"]) / (2 * h)
    assert g["delta"] == pytest.approx(fd_delta, abs=2e-3)
    hr = 0.002
    up = HHWEngine(dataclasses.replace(FULL, sigma_r=FULL.sigma_r + hr),
                   num_paths=100_000, num_steps=64, seed=1)
    dn = HHWEngine(dataclasses.replace(FULL, sigma_r=FULL.sigma_r - hr),
                   num_paths=100_000, num_steps=64, seed=1)
    fd_rv = (up.price(SPOT, K, T)["price"]
             - dn.price(SPOT, K, T)["price"]) / (2 * hr)
    assert g["rate_vega"] == pytest.approx(fd_rv, rel=0.02)
    # vega_per_vol_point must be 2*sigma*dP/dv0 (engine/greeks.py:400
    # convention, NO /100): pin against a CRN v0-bump FD.
    hv = 0.002
    vu = HHWEngine(dataclasses.replace(FULL, v0=FULL.v0 + hv),
                   num_paths=100_000, num_steps=64, seed=1)
    vd = HHWEngine(dataclasses.replace(FULL, v0=FULL.v0 - hv),
                   num_paths=100_000, num_steps=64, seed=1)
    fd_dv0 = (vu.price(SPOT, K, T)["price"]
              - vd.price(SPOT, K, T)["price"]) / (2 * hv)
    sigma0 = np.sqrt(FULL.v0)
    assert g["vega_per_vol_point"] == pytest.approx(2 * sigma0 * fd_dv0,
                                                    rel=0.03)


def test_rate_vol_impact_positive_for_long_dated_positive_corr():
    eng = HHWEngine(FULL, num_paths=100_000, num_steps=64, seed=5)
    imp = eng.rate_vol_impact(SPOT, K, T)
    assert imp["stochastic_rates_premium"] > 0
    assert imp["price_deterministic_rates"] > 0


def test_put_call_parity_discounted():
    # c - p = S0 e^{-qT} - K P(0,T) pathwise in expectation.
    eng = HHWEngine(FULL, num_paths=200_000, num_steps=64, seed=6)
    c = eng.price(SPOT, K, T, is_call=True)
    p = eng.price(SPOT, K, T, is_call=False)
    lhs = c["price"] - p["price"]
    rhs = SPOT * np.exp(-FULL.q * T) - K * vasicek_bond(FULL, T)
    joint = np.hypot(c["std_error"], p["std_error"])
    # CRN paths make the parity residual tighter than the naive joint SE.
    assert abs(lhs - rhs) < 4 * joint + 0.02
