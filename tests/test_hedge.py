"""Static replication (engine/hedge.py): exact self-replication, digital ≈
tight call spread, and honest residuals for path-dependent targets."""

import numpy as np
import pytest

from mcos_tpu.engine.hedge import StaticHedgeEngine
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops.cos_pricer import cos_price

SPOT, T = 22500.0, 0.25


@pytest.fixture(scope="module")
def eng():
    p = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                  lambda_j=0.5, mu_j=-0.05, sigma_j=0.10)
    return StaticHedgeEngine(p, num_paths=50_000, num_steps=64, seed=11)


def test_vanilla_self_replication(eng):
    """A call whose strike sits in the hedge grid is its own exact hedge:
    R² = 1 and the hedge portfolio's COS value equals the call's."""
    out = eng.replicate(SPOT, T, kind="vanilla", strike=SPOT,
                        hedge_strikes=np.linspace(0.9, 1.1, 5) * SPOT)
    assert out["r2"] > 0.999999
    ref = float(cos_price(eng.params, SPOT, np.asarray([SPOT]), T, True)[0])
    assert out["hedge_value"] == pytest.approx(ref, rel=2e-3)
    assert out["resid_std"] < 1e-2 * ref


def test_digital_replicates_as_call_spread(eng):
    """A cash digital projects onto a tight call spread around the strike:
    high R² with a dense grid, weights sum to ~0 across calls (bounded
    payoff), and the hedge value sits near the MC digital price."""
    ks = np.linspace(0.94, 1.06, 13) * SPOT
    out = eng.replicate(SPOT, T, kind="digital", strike=SPOT,
                        hedge_strikes=ks)
    assert out["r2"] > 0.93
    w = np.asarray(out["weights"]["calls"])
    # Net call exposure ≈ 0 and the spread structure straddles the strike:
    # positive mass below, negative above (∂/∂K of a call is negative).
    assert abs(w.sum()) < 0.05 * np.abs(w).max()
    assert out["hedge_value"] == pytest.approx(
        out["target_price_mc"], abs=6 * out["target_se"] + 0.01)
    assert 0.0 < out["unhedgeable_fraction"] < 0.3


def test_asian_residual_is_honest(eng):
    """An arithmetic Asian is NOT statically replicable from terminal
    vanillas — R² must be high (strong S_T correlation) but strictly
    below 1, with a nonzero residual distribution."""
    out = eng.replicate(SPOT, T, kind="asian", strike=SPOT)
    assert 0.50 < out["r2"] < 0.99999
    assert out["resid_std"] > 0
    q = out["resid_quantiles"]
    assert q["p01"] < q["p50"] < q["p99"]
    assert 0.0 < out["unhedgeable_fraction"] < 0.75


def test_barrier_harder_than_vanilla(eng):
    """An up-and-out call carries genuine path risk: its projection
    residual exceeds the vanilla's."""
    van = eng.replicate(SPOT, T, kind="vanilla", strike=SPOT)
    bar = eng.replicate(SPOT, T, kind="barrier", strike=SPOT,
                        barrier=SPOT * 1.12, knock="out", direction="up")
    assert bar["r2"] < van["r2"]
    assert bar["resid_std"] > van["resid_std"]


def test_bad_inputs(eng):
    with pytest.raises(ValueError):
        eng.replicate(SPOT, T, kind="powerball")
    with pytest.raises(ValueError):
        eng.replicate(SPOT, T, kind="digital", strike=SPOT, hedge_strikes=[])


def test_gbm_digital_matches_closed_form():
    """Degenerate-GBM digital: hedge value ≈ e^{-rT}·N(d2) (the BS
    cash-or-nothing price) once the grid is dense enough."""
    from scipy.stats import norm

    sigma, r, q = 0.2, 0.065, 0.012
    e = StaticHedgeEngine(gbm_params(sigma, r=r, q=q), num_paths=100_000,
                          num_steps=32, seed=3)
    out = e.replicate(SPOT, T, kind="digital", strike=SPOT,
                      hedge_strikes=np.linspace(0.92, 1.08, 17) * SPOT)
    d2 = ((np.log(SPOT / SPOT) + (r - q - 0.5 * sigma**2) * T)
          / (sigma * np.sqrt(T)))
    ref = float(np.exp(-r * T) * norm.cdf(d2))
    assert out["target_price_mc"] == pytest.approx(
        ref, abs=4 * out["target_se"])
    assert out["hedge_value"] == pytest.approx(ref, abs=0.02 * ref + 5e-3)
