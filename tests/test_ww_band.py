"""Whalley-Wilmott no-transaction-band hedging (hedge="ww_band").

The asymptotically optimal policy under proportional costs: hold while
the position is inside Delta +/- (3/2 k S Gamma^2 / gamma)^{1/3}, trade
to the nearest band edge when outside. Oracles:
  - zero cost collapses the band to zero = the daily-delta strategy,
    bit-identical on CRN paths;
  - with real costs the band strategy cuts total transaction cost and
    improves the mean - gamma/2 Var utility at its own gamma (the
    objective the band optimizes);
  - higher risk aversion => tighter band => more trading cost and less
    P&L dispersion (monotone both ways).
"""

import numpy as np
import pytest

from mcos_tpu.engine.risk import HedgingBacktest
from mcos_tpu.models.params import SVJParams, gbm_params

SPOT, STRIKE, T = 22500.0, 22500.0, 0.25
P = gbm_params(0.2)


def _run(hedge, txn=5.0, slip=2.0, gamma=1e-3, dynamics="gbm", seed=42):
    bt = HedgingBacktest(P if dynamics == "gbm" else SVJParams(), seed=seed)
    return bt.run_backtest(SPOT, STRIKE, T, is_call=True,
                           txn_cost_bps=txn, slippage_bps=slip,
                           num_scenarios=512, num_mc_paths=20_000,
                           dynamics=dynamics, hedge=hedge,
                           risk_aversion=gamma)


def test_zero_cost_band_equals_daily_delta():
    a = _run("bs_delta", txn=0.0, slip=0.0)
    b = _run("ww_band", txn=0.0, slip=0.0)
    assert a["mean_pnl"] == pytest.approx(b["mean_pnl"], abs=1e-6)
    assert a["std_pnl"] == pytest.approx(b["std_pnl"], abs=1e-6)


def test_band_cuts_cost_and_improves_utility():
    gamma = 1e-3
    daily = _run("bs_delta", gamma=gamma)
    band = _run("ww_band", gamma=gamma)
    # Large cost reduction is the headline claim of the theory...
    assert band["total_txn_cost_avg"] < 0.5 * daily["total_txn_cost_avg"]
    # ... and the band optimizes mean - gamma/2 Var at its own gamma.
    u_daily = daily["mean_pnl"] - 0.5 * gamma * daily["std_pnl"] ** 2
    u_band = band["mean_pnl"] - 0.5 * gamma * band["std_pnl"] ** 2
    assert u_band > u_daily


def test_band_width_monotone_in_risk_aversion():
    loose = _run("ww_band", gamma=1e-5)
    tight = _run("ww_band", gamma=1e-2)
    assert tight["total_txn_cost_avg"] > loose["total_txn_cost_avg"]
    # Tighter band => tighter tracking => lower replication dispersion.
    assert tight["std_pnl"] < loose["std_pnl"]


def test_band_works_in_svj_world():
    out = _run("ww_band", dynamics="svj")
    assert np.isfinite(out["mean_pnl"]) and out["total_txn_cost_avg"] > 0


def test_validation():
    bt = HedgingBacktest(P)
    with pytest.raises(ValueError):
        bt.run_backtest(SPOT, STRIKE, T, hedge="ww_band", dynamics="rough",
                        num_scenarios=16, num_mc_paths=1000)
    with pytest.raises(ValueError):
        bt.run_backtest(SPOT, STRIKE, T, hedge="ww_band", risk_aversion=0.0,
                        num_scenarios=16, num_mc_paths=1000)


def test_api_hedge_ww_band():
    from mcos_tpu.api import server as api

    out = api.handle_hedge({
        "spot": SPOT, "strike": STRIKE, "T": T, "num_scenarios": 64,
        "hedge": "ww_band", "risk_aversion": 2.0})
    assert out["hedge"] == "ww_band"
    assert np.isfinite(out["mean_pnl"])
