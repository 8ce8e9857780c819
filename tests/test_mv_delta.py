"""Minimum-variance delta (Hull-White 2017) — the variance-optimal hedge
ratio under stochastic vol, and its effect inside the hedging backtest.

h* = argmin_h Var(dP - h dS) = Delta + (dP/dv0)*rho*xi/S between jumps.
The reference hedges with the plain BS delta only (risk.py:283); this is
new capability. Oracles here:
  - rho=0 collapses h* to the pathwise delta exactly;
  - in a near-BS Heston regime the AD dP/dv0 matches the closed-form proxy
    vega_BS/(2 sigma);
  - in-economy: CRN backtests (same seed => identical world paths, only the
    hedge ratio differs) show the MV hedge cutting P&L dispersion in the
    SVJ world with rho<0 and adding pure noise in the GBM world.
"""

import numpy as np
import pytest

from mcos_tpu.engine.greeks import GreeksEngine
from mcos_tpu.engine.risk import HedgingBacktest
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops.bs import bs_vega

SPOT, STRIKE = 22500.0, 22500.0


def test_mv_delta_rho_zero_equals_delta():
    p = SVJParams(kappa=2.0, theta=0.04, xi=0.4, rho=0.0, v0=0.04,
                  lambda_j=0.0, mu_j=0.0, sigma_j=0.0)
    eng = GreeksEngine(p, num_paths=50_000, seed=11)
    out = eng.min_variance_delta(SPOT, STRIKE, 0.25)
    assert out["adjustment"] == 0.0
    assert out["mv_delta"] == out["delta"]


def test_mv_delta_below_delta_with_negative_rho():
    """rho<0, dP/dv0>0 => the MV ratio sits strictly below the pathwise
    delta (for calls AND puts — the adjustment has the sign of rho)."""
    p = SVJParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04,
                  lambda_j=1.0, mu_j=-0.05, sigma_j=0.1)
    eng = GreeksEngine(p, num_paths=100_000, seed=11)
    call = eng.min_variance_delta(SPOT, STRIKE, 0.25, is_call=True)
    put = eng.min_variance_delta(SPOT, STRIKE, 0.25, is_call=False)
    assert call["dP_dv0"] > 0 and put["dP_dv0"] > 0
    assert call["adjustment"] < 0
    assert call["mv_delta"] < call["delta"]
    assert put["mv_delta"] < put["delta"]
    # sanity: the adjustment is a correction, not a sign flip, at ATM
    assert abs(call["adjustment"]) < 0.5 * abs(call["delta"])


def test_mv_adjustment_matches_bs_vega_proxy():
    """Near-BS Heston regime (theta=v0 so the drift pull vanishes, small
    xi): AD dP/dv0 should match the closed-form proxy
    vega_BS/(2 sigma) * (1-e^{-kappa T})/(kappa T) used by the in-scan
    backtest hedge (a v0 shock decays toward theta at rate kappa, so the
    integrated variance moves by the decay factor, not one-for-one)."""
    v0, T = 0.04, 0.25
    p = SVJParams(kappa=2.0, theta=v0, xi=0.1, rho=-0.5, v0=v0,
                  lambda_j=0.0, mu_j=0.0, sigma_j=0.0)
    eng = GreeksEngine(p, num_paths=200_000, seed=3)
    out = eng.min_variance_delta(SPOT, STRIKE, T)
    sigma = np.sqrt(v0)
    ktau = p.kappa * T
    decay = -np.expm1(-ktau) / ktau
    proxy = (float(bs_vega(SPOT, STRIKE, T, p.r, p.q, sigma))
             * decay / (2 * sigma))
    assert out["dP_dv0"] == pytest.approx(proxy, rel=0.10)


def test_backtest_mv_reduces_pnl_dispersion_in_svj_world():
    """CRN A/B: identical SVJ world paths (same seed), only the hedge ratio
    differs. With rho=-0.8 the vega bleed is strongly anti-correlated with
    spot moves, so the MV hedge must cut the P&L std of the replication."""
    p = SVJParams(kappa=2.0, theta=0.04, xi=0.6, rho=-0.8, v0=0.04,
                  lambda_j=0.0, mu_j=0.0, sigma_j=0.0)
    bt = HedgingBacktest(p, seed=5)
    kw = dict(num_scenarios=3000, num_mc_paths=20_000, dynamics="svj")
    bs = bt.run_backtest(SPOT, STRIKE, 0.1, **kw)
    mv = bt.run_backtest(SPOT, STRIKE, 0.1, hedge="mv_delta", **kw)
    assert bs["hedge"] == "bs_delta" and mv["hedge"] == "mv_delta"
    assert mv["std_pnl"] < bs["std_pnl"]
    # the improvement is material, not numerical dust
    assert mv["std_pnl"] < 0.97 * bs["std_pnl"]


def test_backtest_mv_is_noise_in_gbm_world():
    """In the GBM world vol never moves, so the MV tilt hedges a risk that
    does not exist — it must NOT improve (and typically worsens) the
    dispersion. CRN again: same world paths for both runs."""
    p = SVJParams(kappa=2.0, theta=0.04, xi=0.6, rho=-0.8, v0=0.04,
                  lambda_j=0.0, mu_j=0.0, sigma_j=0.0)
    bt = HedgingBacktest(p, seed=5)
    kw = dict(num_scenarios=2000, num_mc_paths=20_000, dynamics="gbm")
    bs = bt.run_backtest(SPOT, STRIKE, 0.1, **kw)
    mv = bt.run_backtest(SPOT, STRIKE, 0.1, hedge="mv_delta", **kw)
    assert mv["std_pnl"] >= 0.99 * bs["std_pnl"]


def test_backtest_mv_rho_zero_identical():
    """rho=0 kills the adjustment inside the scan => bit-identical P&L."""
    p = SVJParams(kappa=2.0, theta=0.04, xi=0.5, rho=0.0, v0=0.04,
                  lambda_j=0.0, mu_j=0.0, sigma_j=0.0)
    bt = HedgingBacktest(p, seed=9)
    kw = dict(num_scenarios=500, num_mc_paths=10_000, dynamics="svj")
    bs = bt.run_backtest(SPOT, STRIKE, 0.1, **kw)
    mv = bt.run_backtest(SPOT, STRIKE, 0.1, hedge="mv_delta", **kw)
    assert mv["std_pnl"] == pytest.approx(bs["std_pnl"], rel=1e-6)
    assert mv["mean_pnl"] == pytest.approx(bs["mean_pnl"], abs=1e-6)


def test_backtest_mv_rough_and_unknown_hedge_raise():
    bt = HedgingBacktest(gbm_params(0.2), seed=1)
    with pytest.raises(ValueError, match="mv_delta"):
        bt.run_backtest(100.0, 100.0, 0.1, dynamics="rough",
                        hedge="mv_delta", num_scenarios=10)
    with pytest.raises(ValueError, match="unknown hedge"):
        bt.run_backtest(100.0, 100.0, 0.1, hedge="gamma_neutral",
                        num_scenarios=10)
