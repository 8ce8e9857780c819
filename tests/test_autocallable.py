"""Autocallable notes: digital closed-form limit, bond limit, probability
accounting, and barrier/coupon monotonicity."""

import numpy as np
import pytest

from mcos_tpu.engine.autocallable import AutocallableEngine, no_call_note_bs
from mcos_tpu.models.params import SVJParams, gbm_params

GBM = gbm_params(0.2, r=0.05, q=0.01)
SVJ = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                lambda_j=1.0, mu_j=-0.05, sigma_j=0.1, r=0.05, q=0.01)


@pytest.fixture(scope="module")
def gbm_engine():
    return AutocallableEngine(GBM, num_paths=200_000, steps_per_period=16,
                              seed=1)


def test_unreachable_autocall_matches_digital_closed_form(gbm_engine):
    res = gbm_engine.price(1.0, n_obs=4, autocall_barrier=50.0,
                           coupon_barrier=0.8, protection_barrier=0.7,
                           coupon=0.02)
    cf = no_call_note_bs(1.0, 0.05, 0.01, 0.2, 0.8, 0.7, 0.08)
    assert abs(res["price"] - cf) < 4 * res["std_error"] + 5e-4
    assert res["survival_prob"] == pytest.approx(1.0)
    assert res["call_prob_by_date"] == [0.0] * 4


def test_full_protection_collapses_to_bond(gbm_engine):
    res = gbm_engine.price(1.0, n_obs=4, autocall_barrier=50.0,
                           coupon_barrier=0.0, protection_barrier=0.0,
                           coupon=0.02)
    assert res["price"] == pytest.approx(np.exp(-0.05) * 1.08, abs=1e-5)
    assert res["std_error"] < 1e-6      # payoff is deterministic


def test_probability_accounting(gbm_engine):
    res = gbm_engine.price(1.0, n_obs=4, autocall_barrier=1.0,
                           coupon_barrier=0.8, protection_barrier=0.7,
                           coupon=0.02)
    probs = np.asarray(res["call_prob_by_date"])
    assert np.all(probs >= 0)
    assert probs.sum() + res["survival_prob"] == pytest.approx(1.0, abs=1e-6)
    assert res["loss_prob"] <= res["survival_prob"] + 1e-9
    assert 0.25 <= res["expected_life"] <= 1.0


def test_monotonicities():
    eng = AutocallableEngine(SVJ, num_paths=100_000, seed=2)
    base = eng.price(1.0, n_obs=4, autocall_barrier=1.0,
                     coupon_barrier=0.8, protection_barrier=0.7,
                     coupon=0.02)
    rich = eng.price(1.0, n_obs=4, autocall_barrier=1.0,
                     coupon_barrier=0.8, protection_barrier=0.7,
                     coupon=0.04)
    deep = eng.price(1.0, n_obs=4, autocall_barrier=1.0,
                     coupon_barrier=0.8, protection_barrier=0.5,
                     coupon=0.02)
    assert rich["price"] > base["price"]        # richer coupons
    assert deep["price"] > base["price"]        # deeper protection
    # jumps make losses likelier than the GBM world at equal vol level
    assert base["loss_prob"] > 0


def test_jump_risk_prices_in():
    """The SVJ note must be cheaper than its jump-free Heston twin: the
    crash component feeds straight into the down-and-in put."""
    no_jump = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                        lambda_j=0.0, mu_j=0.0, sigma_j=1e-4, r=0.05,
                        q=0.01)
    kw = dict(n_obs=4, autocall_barrier=1.0, coupon_barrier=0.8,
              protection_barrier=0.7, coupon=0.02)
    a = AutocallableEngine(SVJ, num_paths=200_000, seed=3).price(1.0, **kw)
    b = AutocallableEngine(no_jump, num_paths=200_000, seed=3).price(
        1.0, **kw)
    assert a["price"] < b["price"] - 2 * np.hypot(a["std_error"],
                                                  b["std_error"])


# ─────────────────────────────────────────────────────────────────────────────
# Worst-of (multi-asset) notes
# ─────────────────────────────────────────────────────────────────────────────
def test_worst_of_rho1_identical_assets_pins_single_asset():
    from mcos_tpu.engine.autocallable import WorstOfAutocallableEngine
    kw = dict(n_obs=4, autocall_barrier=1.0, coupon_barrier=0.8,
              protection_barrier=0.7, coupon=0.02)
    single = AutocallableEngine(GBM, num_paths=100_000, seed=1).price(
        1.0, **kw)
    wof = WorstOfAutocallableEngine([GBM] * 3, np.full((3, 3), 1.0),
                                    num_paths=100_000, seed=1).price(
        1.0, **kw)
    assert wof["price"] == pytest.approx(single["price"], abs=3e-3)
    assert wof["n_assets"] == 3


def test_worst_of_cheapens_with_dispersion():
    from mcos_tpu.engine.autocallable import WorstOfAutocallableEngine
    kw = dict(n_obs=4, autocall_barrier=1.0, coupon_barrier=0.8,
              protection_barrier=0.7, coupon=0.02)
    corr_hi = np.full((3, 3), 0.95)
    np.fill_diagonal(corr_hi, 1.0)
    corr_lo = np.full((3, 3), 0.3)
    np.fill_diagonal(corr_lo, 1.0)
    hi = WorstOfAutocallableEngine([GBM] * 3, corr_hi, num_paths=100_000,
                                   seed=1).price(1.0, **kw)
    lo = WorstOfAutocallableEngine([GBM] * 3, corr_lo, num_paths=100_000,
                                   seed=1).price(1.0, **kw)
    # The worst of less-correlated assets is worse: lower price, higher
    # loss probability, later expected redemption.
    assert lo["price"] < hi["price"]
    assert lo["loss_prob"] > hi["loss_prob"]
    assert lo["expected_life"] > hi["expected_life"]


def test_par_coupon_solver_exact_by_linearity():
    """On CRN paths the note value is exactly linear in the coupon, so
    the two-evaluation solve must land the target to float precision;
    the worst-of par coupon must exceed the single-asset one (dispersion
    premium)."""
    from mcos_tpu.engine.autocallable import WorstOfAutocallableEngine
    eng = AutocallableEngine(SVJ, num_paths=50_000, seed=2)
    sol = eng.solve_par_coupon(1.0, n_obs=4, autocall_barrier=1.0,
                               coupon_barrier=0.8,
                               protection_barrier=0.7)
    assert sol["price_at_par_coupon"] == pytest.approx(1.0, abs=1e-5)
    assert 0.0 < sol["par_coupon"] < 0.2
    assert sol["coupon_sensitivity"] > 0

    corr = np.full((3, 3), 0.6)
    np.fill_diagonal(corr, 1.0)
    wo = WorstOfAutocallableEngine([SVJ] * 3, corr, num_paths=50_000,
                                   seed=2)
    s2 = wo.solve_par_coupon(1.0, n_obs=4)
    assert s2["price_at_par_coupon"] == pytest.approx(1.0, abs=1e-5)
    assert s2["par_coupon"] > sol["par_coupon"]
