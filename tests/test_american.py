"""American LSM vs the CRR binomial oracle and no-arbitrage orderings."""

import numpy as np
import pytest

from mcos_tpu.engine.american import AmericanEngine, binomial_american_bs
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops.bs import bs_price

S, K, T = 100.0, 100.0, 0.5
R, Q, SIGMA = 0.06, 0.0, 0.25


@pytest.fixture(scope="module")
def gbm_engine():
    return AmericanEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=100_000,
                          num_steps=100, seed=5)


def test_binomial_oracle_converges_to_bs_european_limit():
    """With q=0 the American call never exercises early: tree = BS."""
    tree = binomial_american_bs(S, K, T, R, Q, SIGMA, steps=2000, is_call=True)
    euro = float(bs_price(S, K, T, R, Q, SIGMA, True))
    assert tree == pytest.approx(euro, rel=2e-3)


def test_lsm_put_matches_binomial(gbm_engine):
    lsm = gbm_engine.price(S, K, T, is_call=False)
    tree = binomial_american_bs(S, K, T, R, Q, SIGMA, steps=2000,
                                is_call=False)
    # LSM: small low bias (suboptimal exercise) + discrete dates + MC noise.
    assert lsm["price"] == pytest.approx(tree, rel=0.01)
    assert lsm["price"] <= tree + 3 * lsm["std_error"]


def test_lsm_itm_put_matches_binomial(gbm_engine):
    lsm = gbm_engine.price(S, 115.0, T, is_call=False)
    tree = binomial_american_bs(S, 115.0, T, R, Q, SIGMA, steps=2000,
                                is_call=False)
    assert lsm["price"] == pytest.approx(tree, rel=0.01)
    # Deep ITM American put carries early-exercise premium over European.
    euro = float(bs_price(S, 115.0, T, R, Q, SIGMA, False))
    assert lsm["price"] > euro + 3 * lsm["std_error"]


def test_american_call_no_dividends_equals_european(gbm_engine):
    """With q=0 early exercise is never optimal: the LSM price must match
    the *same paths'* European value (isolates false-exercise loss from MC
    noise) and sit near the analytic BS price."""
    import jax
    import numpy as np
    from mcos_tpu.engine.american import _record_log_paths

    lsm = gbm_engine.price(S, K, T, is_call=True)
    lp = _record_log_paths(gbm_engine.params, S, T,
                           jax.random.key(gbm_engine.seed),
                           num_paths=gbm_engine.num_paths,
                           num_steps=lsm["num_steps"])
    s_t = np.exp(np.asarray(lp[-1]))
    euro_same_paths = float(np.exp(-R * T) * np.maximum(s_t - K, 0).mean())
    # False-exercise loss bounded at 0.5% of premium.
    assert lsm["price"] > euro_same_paths * 0.995
    assert lsm["price"] < euro_same_paths + 3 * lsm["std_error"]
    euro = float(bs_price(S, K, T, R, Q, SIGMA, True))
    assert lsm["price"] == pytest.approx(euro, rel=0.02)


def test_american_call_with_dividends_exceeds_european():
    eng = AmericanEngine(gbm_params(SIGMA, r=0.02, q=0.08),
                         num_paths=100_000, num_steps=100, seed=6)
    lsm = eng.price(S, 90.0, 1.0, is_call=True)  # ITM call, heavy carry
    euro = float(bs_price(S, 90.0, 1.0, 0.02, 0.08, SIGMA, True))
    tree = binomial_american_bs(S, 90.0, 1.0, 0.02, 0.08, SIGMA, steps=2000,
                                is_call=True)
    assert lsm["price"] > euro + 3 * lsm["std_error"]
    assert lsm["price"] == pytest.approx(tree, rel=0.015)


def test_american_at_least_intrinsic(gbm_engine):
    lsm = gbm_engine.price(S, 130.0, 0.05, is_call=False)
    assert lsm["price"] >= 30.0 - 1e-6


def test_lsm_on_svj():
    svj = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                    lambda_j=1.0, mu_j=-0.05, sigma_j=0.1, r=0.06, q=0.0)
    eng = AmericanEngine(svj, num_paths=50_000, num_steps=64, seed=7)
    amer = eng.price(S, K, 0.5, is_call=False)
    # American ≥ its own European twin under the same dynamics.
    from mcos_tpu.engine.pricer import MonteCarloEngine
    euro = MonteCarloEngine(svj, num_paths=50_000, num_steps=128,
                            use_sobol=False, seed=7).price(S, K, 0.5, False)
    assert amer["price"] > euro["price"] - 3 * (
        amer["std_error"] + euro["std_error"])
    assert np.isfinite(amer["price"]) and amer["price"] > 0


# ── Dual bounds (Andersen-Broadie / Haugh-Kogan) ─────────────────────────────
@pytest.fixture(scope="module")
def bounds_engine():
    return AmericanEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=100_000,
                          num_steps=32, seed=5)


@pytest.mark.parametrize("strike", [90.0, 100.0, 110.0])
def test_bounds_bracket_crr(bounds_engine, strike):
    """lower − 3σ ≤ CRR American ≤ upper + 3σ, with a tight duality gap.

    (The MC prices a 16-date Bermudan, whose true value sits slightly below
    the continuous American CRR value — the upper bound must still clear
    CRR only within its Bermudan-vs-American slack, hence the soft floor.)
    """
    res = bounds_engine.price_bounds(S, strike, T, is_call=False,
                                     n_inner=256)
    crr = binomial_american_bs(S, strike, T, R, Q, SIGMA, is_call=False)
    assert res["lower_bound"] - 3 * res["lower_se"] <= crr + 0.02
    assert res["upper_bound"] + 3 * res["upper_se"] >= crr - 0.05
    assert res["lower_bound"] <= res["upper_bound"] + 1e-6
    assert res["duality_gap"] < 0.10 * max(crr, 1.0)


def test_bounds_call_no_dividends_collapse(bounds_engine):
    """q=0 American call = European call; both bounds must sit on it."""
    res = bounds_engine.price_bounds(S, K, T, is_call=True, n_inner=256)
    euro = float(bs_price(S, K, T, R, Q, SIGMA, True))
    assert abs(res["lower_bound"] - euro) < max(4 * res["lower_se"], 0.10)
    assert res["upper_bound"] >= res["lower_bound"] - 1e-6
    assert res["duality_gap"] < 0.05 * euro


def test_bounds_odd_n_inner_traces(bounds_engine):
    """Odd n_inner must not crash at trace time (the antithetic concat
    rounds it down to even internally)."""
    res = bounds_engine.price_bounds(S, K, T, is_call=False, n_inner=33)
    assert res["lower_bound"] <= res["upper_bound"] + 1e-6


def test_bounds_svj_ordering():
    """Under full SVJ: lower ≤ upper and both ≥ discounted intrinsic."""
    svj = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                    lambda_j=1.0, mu_j=-0.05, sigma_j=0.1, r=R, q=0.012)
    eng = AmericanEngine(svj, num_paths=65_536, num_steps=32, seed=11)
    res = eng.price_bounds(S, 105.0, 0.5, is_call=False, n_inner=128)
    assert res["lower_bound"] <= res["upper_bound"] + 1e-6
    assert res["upper_bound"] >= 5.0 - 1e-6  # ≥ intrinsic
    assert res["duality_gap"] < 0.15 * res["upper_bound"]


# ── Policy-fixed pathwise AD Greeks ──────────────────────────────────────────
def _crr_fd(greek, strike, is_call=False, h=0.01):
    """CRR central-difference oracle for American Greeks (host f64)."""
    def f(S_=S, sig=SIGMA, r_=R, T_=T):
        return binomial_american_bs(S_, strike, T_, r_, Q, sig, steps=1500,
                                    is_call=is_call)
    if greek == "delta":
        return (f(S_=S * (1 + h)) - f(S_=S * (1 - h))) / (2 * S * h)
    if greek == "gamma":
        return (f(S_=S * (1 + h)) - 2 * f() + f(S_=S * (1 - h))) / (S * h)**2
    if greek == "vega":
        return (f(sig=SIGMA + h) - f(sig=SIGMA - h)) / (2 * h)
    if greek == "rho":
        return (f(r_=R + h / 10) - f(r_=R - h / 10)) / (2 * h / 10)
    if greek == "theta":
        return -(f(T_=T + h / 10) - f(T_=T - h / 10)) / (2 * h / 10)
    raise ValueError(greek)


@pytest.fixture(scope="module")
def put_greeks(bounds_engine):
    return bounds_engine.greeks(S, K, T, is_call=False)


def test_american_delta_matches_crr(put_greeks):
    assert put_greeks["delta"] == pytest.approx(
        _crr_fd("delta", K), abs=0.02)


def test_american_gamma_matches_crr(put_greeks):
    assert put_greeks["gamma"] == pytest.approx(
        _crr_fd("gamma", K), rel=0.25)


def test_american_vega_rho_theta_match_crr(put_greeks):
    # σ-vega: the engine reports 2σ·∂P/∂v0 = ∂P/∂σ.
    assert put_greeks["vega_per_vol_point"] == pytest.approx(
        _crr_fd("vega", K), rel=0.10)
    assert put_greeks["rho"] == pytest.approx(_crr_fd("rho", K), rel=0.15)
    # theta: policy-fixed AD vs tree FD; both small — loose band.
    assert put_greeks["theta_daily"] == pytest.approx(
        _crr_fd("theta", K), rel=0.25)


def test_american_deep_itm_put_delta_near_minus_one(bounds_engine):
    g = bounds_engine.greeks(S, 140.0, T, is_call=False)
    # Immediate exercise region: value ≈ intrinsic ⇒ delta ≈ −1, far below
    # the European put's e^{-qT}·(N(d1)−1) ≈ −0.95 here.
    assert g["delta"] < -0.97
    assert g["gamma"] == pytest.approx(0.0, abs=0.02)


def test_american_call_q0_greeks_equal_european(bounds_engine):
    """q=0 ⇒ no early exercise: American call Greeks = BS closed form."""
    import jax

    g = bounds_engine.greeks(S, K, T, is_call=True)
    delta_bs = float(jax.grad(
        lambda s: bs_price(s, K, T, R, Q, SIGMA, True))(S))
    vega_bs = float(jax.grad(
        lambda sig: bs_price(S, K, T, R, Q, sig, True))(SIGMA))
    assert g["delta"] == pytest.approx(delta_bs, abs=0.02)
    assert g["vega_per_vol_point"] == pytest.approx(vega_bs, rel=0.08)


# ─────────────────────────────────────────────────────────────────────────────
# Bermudan schedules (exercise_every)
# ─────────────────────────────────────────────────────────────────────────────
def test_bermudan_no_early_dates_is_european(gbm_engine):
    """exercise_every >= num_steps leaves only maturity — the LSM machinery
    must reproduce the European put exactly (same paths, no stopping)."""
    res = gbm_engine.price(S, K, T, is_call=False, exercise_every=10_000)
    euro = float(bs_price(S, K, T, R, Q, SIGMA, False))
    assert abs(res["price"] - euro) < max(4 * res["std_error"], 0.02)


def test_bermudan_ordering_euro_leq_bermudan_leq_american(gbm_engine):
    """More exercise rights can only add value: E <= B(quarterly) <= A,
    on one CRN path set (same seed) so the ordering is pathwise-tight."""
    amer = gbm_engine.price(S, K, T, is_call=False, exercise_every=1)
    berm = gbm_engine.price(S, K, T, is_call=False, exercise_every=25)
    euro = gbm_engine.price(S, K, T, is_call=False, exercise_every=10_000)
    tol = 3 * amer["std_error"]
    assert euro["price"] <= berm["price"] + tol
    assert berm["price"] <= amer["price"] + tol
    # the deep-ITM-put premium really is graded (strict at 4 sigma)
    itm_a = gbm_engine.price(S, 120.0, T, is_call=False, exercise_every=1)
    itm_e = gbm_engine.price(S, 120.0, T, is_call=False,
                             exercise_every=10_000)
    assert itm_a["price"] > itm_e["price"] + 4 * itm_a["std_error"]


def test_bermudan_converges_to_american_with_schedule_density(gbm_engine):
    """Halving the exercise spacing moves the Bermudan price toward the
    American from below (monotone in the schedule refinement)."""
    p = {m: gbm_engine.price(S, 115.0, T, is_call=False,
                             exercise_every=m)["price"]
         for m in (50, 10, 2, 1)}
    se = gbm_engine.price(S, 115.0, T, is_call=False)["std_error"]
    assert p[50] <= p[10] + 3 * se
    assert p[10] <= p[2] + 3 * se
    assert p[2] <= p[1] + 3 * se
    assert p[1] - p[50] > 0  # the refinement ladder actually climbs
