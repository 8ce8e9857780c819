"""Every POST endpoint answers a minimal valid request.

A drift net: any schema/handler signature change that breaks an endpoint
fails here even if no feature test covers that route. Workloads are the
smallest the schemas admit (seconds each on CPU); responses are checked
for presence of their headline field and finiteness, not accuracy — the
per-engine suites own accuracy.
"""

import math

import numpy as np
import pytest

from mcos_tpu.api import server as api

SPOT, K, T = 22500.0, 22500.0, 0.25
TINY = {"num_paths": 1_000}
STRIKES = [SPOT * m for m in np.linspace(0.9, 1.1, 5)]
IV_GRID = {"spot": SPOT, "strikes": STRIKES, "maturities": [0.25, 0.5, 1.0],
           "iv": [[0.2] * 5] * 3}

CASES = {
    "/api/price": {"spot": SPOT, "strike": K, "T": T, **TINY},
    "/api/greeks": {"spot": SPOT, "strike": K, "T": T, **TINY},
    "/api/stress": {"spot": SPOT, "strike": K, "T": T, **TINY},
    "/api/regime": {"realized_vol": 0.15, "iv_percentile": 0.5,
                    "skew_slope": 0.02},
    "/api/hedge": {"spot": SPOT, "strike": K, "T": T,
                   "num_scenarios": 50},
    "/api/smile": {"spot": SPOT, "T": T, **TINY},
    "/api/calibrate": {"spot": SPOT, "strikes": STRIKES, "T": T,
                       "market_prices": [2300.0, 1400.0, 800.0, 400.0,
                                         180.0],
                       "fast": True},
    "/api/exotic": {"spot": SPOT, "strike": K, "T": T, "kind": "asian",
                    **TINY},
    "/api/american": {"spot": SPOT, "strike": K, "T": T, **TINY},
    "/api/book": {"spots": [SPOT] * 2, "strikes": [K, K * 1.02],
                  "Ts": [T, T], "is_calls": [True, False], **TINY},
    "/api/basket": {"spots": [100.0, 110.0], "strike": 105.0, "T": T,
                    "corr": [[1.0, 0.5], [0.5, 1.0]],
                    "weights": [0.5, 0.5], **TINY},
    "/api/convergence": {"spot": SPOT, "strike": K, "T": T,
                         "num_paths": 2_000},
    "/api/surface": {**IV_GRID, "call_prices": [[500.0] * 5] * 3,
                     "put_prices": [[400.0] * 5] * 3, "fit_sabr": False},
    "/api/localvol": {**IV_GRID, "price_strikes": [SPOT], "T": 0.5,
                      **TINY, "num_steps": 16},
    "/api/var": {"spots": [100.0, 50.0], "sigmas": [0.2, 0.3],
                 "weights": [0.5, 0.5],
                 "corr": [[1.0, 0.4], [0.4, 1.0]], "T": T, **TINY},
    "/api/cliquet": {"T": 0.5, "n_periods": 2, "steps_per_period": 4,
                     **TINY},
    "/api/rough": {"spot": 100.0, "T": T, "mode": "price",
                   "strike": 100.0, **TINY, "num_steps": 16},
    "/api/exposure": {"spots": [100.0], "sigmas": [0.2], "corr": [[1.0]],
                      "positions": [{"kind": "call", "strike": 100.0,
                                     "T": 0.5}],
                      **TINY, "num_dates": 4},
    "/api/hhw": {"spot": 100.0, "strike": 100.0, "T": 0.5, **TINY,
                 "num_steps": 16},
    "/api/autocall": {"T": 0.5, "n_obs": 2, "steps_per_period": 4,
                      **TINY},
    "/api/quanto": {"spot": 100.0, "strike": 100.0, "T": T, **TINY,
                    "num_steps": 16},
    "/api/pnl": {"strike": K, "spot_old": SPOT, "spot_new": SPOT * 0.99,
                 "T_old": T, "T_new": T - 1 / 252},
    "/api/modelrisk": {"spot": SPOT, "strike": K, "T": T, **TINY},
    "/api/slv": {**IV_GRID, "price_strikes": [SPOT], "T": 0.5, **TINY,
                 "num_steps": 16},
    "/api/svcj": {"spot": SPOT, "T": T, **TINY, "num_steps": 16},
    "/api/roughheston": {"spot": SPOT, "T": T, **TINY, "num_steps": 2048,
                         "n_factors": 8},
    "/api/quotegreeks": {"spot": SPOT, "T": T, "strikes": STRIKES,
                         "product": {"kind": "vanilla", "strike": SPOT,
                                     "T": T}},
    "/api/termsvj": {"spot": SPOT, "T": T, **TINY, "num_steps": 16,
                     "segments": [
                         {"t_end": T / 2, "theta": 0.03, "xi": 0.7,
                          "lambda_j": 2.0},
                         {"t_end": T, "theta": 0.08, "xi": 0.4,
                          "lambda_j": 0.5}]},
    "/api/volderivs": {"kind": "vix_future", "T": 0.5},
    "/api/replicate": {"spot": SPOT, "T": T, "kind": "digital",
                       "strike": K, "n_hedge": 5, **TINY},
    "/api/margin": {"spot": SPOT, "strikes": [K], "Ts": [T],
                    "is_calls": [True], "quantities": [-1.0], **TINY},
    "/api/pde": {"spot": SPOT, "strike": K, "T": T, "n_x": 51, "n_v": 21,
                 "n_t": 16, "params": {"lambda_j": 0.0}},
}

_HEADLINE = {
    "/api/regime": "regime", "/api/hedge": "pnl_percentiles", "/api/book": "book_value",
    "/api/greeks": "delta", "/api/stress": "spot_shocks",
    "/api/smile": "smile", "/api/calibrate": "params",
    "/api/convergence": "price",
    "/api/surface": "iv_call", "/api/localvol": "chain",
    "/api/var": "var", "/api/exposure": "ee", "/api/pnl": "total_pnl",
    "/api/modelrisk": "prices", "/api/slv": "chain", "/api/svcj": "price",
    "/api/volderivs": "future", "/api/quotegreeks": "buckets",
    "/api/margin": "margin",
    "/api/replicate": "hedge_value",
}


@pytest.mark.parametrize("route", sorted(CASES))
def test_endpoint_answers_minimal_request(route):
    handler = api.POST_ROUTES[route]
    out = handler(CASES[route])
    key = _HEADLINE.get(route, "price")
    assert key in out, (route, sorted(out))
    val = out[key]
    if isinstance(val, float):
        assert math.isfinite(val), route


def test_every_post_route_has_a_sweep_case():
    missing = sorted(set(api.POST_ROUTES) - set(CASES))
    assert not missing, f"add sweep cases for: {missing}"
