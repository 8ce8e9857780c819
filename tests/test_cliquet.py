"""Cliquet / forward-start: GBM closed-form oracles + SVJ sanity."""

import numpy as np
import pytest

from mcos_tpu.engine.cliquet import (CliquetEngine, cliquet_bs,
                                     forward_start_bs)
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops.bs import bs_price

R, Q, SIGMA = 0.05, 0.01, 0.2


@pytest.fixture(scope="module")
def gbm_engine():
    return CliquetEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=100_000,
                         steps_per_period=8, seed=3)


def test_forward_start_bs_degenerates_to_vanilla():
    """t1 → 0: the performance option is a vanilla on S/S0 (unit spot)."""
    fs = forward_start_bs(1e-9, 0.5, 1.0, R, Q, SIGMA)
    vanilla = float(bs_price(1.0, 1.0, 0.5, R, Q, SIGMA, True))
    assert fs == pytest.approx(vanilla, rel=1e-6)


def test_cliquet_bs_vs_bruteforce():
    """Closed form vs a 2M-sample host MC of the uncapped clipped sum."""
    rng = np.random.default_rng(0)
    tau, n = 0.25, 2_000_000
    z = rng.standard_normal((4, n))
    r_per = np.exp((R - Q - 0.5 * SIGMA**2) * tau
                   + SIGMA * np.sqrt(tau) * z) - 1.0
    mc = float(np.exp(-R) * np.clip(r_per, 0.0, 0.08).sum(axis=0).mean())
    assert cliquet_bs(1.0, 4, R, Q, SIGMA, 0.0, 0.08) == pytest.approx(
        mc, abs=3e-4)


def test_cliquet_matches_bs_gbm(gbm_engine):
    """Global constraints off: MC == closed form with the exact companion
    control driving std_error to ~0 in the GBM limit."""
    out = gbm_engine.price_cliquet(1.0, n_periods=4, local_floor=0.0,
                                   local_cap=0.08, global_floor=-np.inf,
                                   global_cap=np.inf)
    ref = cliquet_bs(1.0, 4, R, Q, SIGMA, 0.0, 0.08)
    assert out["price"] == pytest.approx(ref, abs=1e-4)
    assert out["std_error"] < 1e-6
    assert out["cv_beta"] == pytest.approx(1.0, abs=1e-3)


def test_forward_start_matches_bs_gbm(gbm_engine):
    out = gbm_engine.price_forward_start(0.25, 1.0, k=1.0)
    ref = forward_start_bs(0.25, 1.0, 1.0, R, Q, SIGMA)
    assert out["t1_effective"] == pytest.approx(0.25, abs=1e-6)
    assert out["price"] == pytest.approx(ref, abs=1e-4)
    assert out["std_error"] < 1e-6
    # put via parity, also exact
    pout = gbm_engine.price_forward_start(0.25, 1.0, k=1.0, is_call=False)
    pref = forward_start_bs(0.25, 1.0, 1.0, R, Q, SIGMA, is_call=False)
    assert pout["price"] == pytest.approx(pref, abs=1e-4)


def test_global_floor_adds_value(gbm_engine):
    """clip(Σ, 0, ∞) ≥ Σ pathwise ⇒ the floored cliquet is worth more."""
    floored = gbm_engine.price_cliquet(1.0, n_periods=4, local_floor=-0.05,
                                       local_cap=0.08, global_floor=0.0)
    unfloored = gbm_engine.price_cliquet(1.0, n_periods=4, local_floor=-0.05,
                                         local_cap=0.08,
                                         global_floor=-np.inf)
    assert floored["price"] >= unfloored["price"] - 1e-9
    assert floored["price"] > 0


def test_cliquet_svj_unclipped_sum_is_model_free():
    """With ALL clips off, Σⱼ E[Rⱼ] = n·(e^{(r−q)τ} − 1) for ANY
    risk-neutral dynamics — a sharp test that the SVJ jump compensation
    survives the period-return decomposition (a drift bug shows up scaled
    by n_periods here)."""
    jumpy = SVJParams(kappa=3.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04,
                      lambda_j=1.5, mu_j=-0.08, sigma_j=0.05, r=R, q=Q)
    eng = CliquetEngine(jumpy, num_paths=200_000, steps_per_period=8,
                        seed=7, use_control_variate=False)
    out = eng.price_cliquet(1.0, 4, local_floor=-np.inf, local_cap=np.inf,
                            global_floor=-np.inf, global_cap=np.inf)
    tau = 0.25
    ref = np.exp(-R) * 4 * (np.exp((R - Q) * tau) - 1.0)
    assert out["price"] == pytest.approx(ref, abs=5 * out["std_error"] + 2e-4)


def test_cliquet_svj_vs_heston_floor_effect():
    """Floored cliquets respond to jumps through two channels (compensator
    drift up, jump downside clipped); the engine must price both finitely
    and keep the floored value above the unfloored one."""
    jumpy = SVJParams(kappa=3.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04,
                      lambda_j=1.5, mu_j=-0.08, sigma_j=0.05, r=R, q=Q)
    eng = CliquetEngine(jumpy, num_paths=150_000, steps_per_period=8, seed=7)
    lo = eng.price_cliquet(1.0, 4, local_floor=-0.05, local_cap=0.06)
    hi = eng.price_cliquet(1.0, 4, local_floor=0.0, local_cap=0.06)
    assert hi["price"] >= lo["price"] - 1e-9
    assert np.isfinite(lo["std_error"]) and lo["price"] > 0
