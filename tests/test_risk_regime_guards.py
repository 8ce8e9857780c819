"""Risk engine, regime detector, guards — reference-parity behavior tests.

The regime expectations mirror verify.py:58-69's three canned inputs; the risk
metrics match the reference estimator definitions on a synthetic normal
sample (verify.py:80-91)."""

import jax
import numpy as np
import pytest

from mcos_tpu.engine.guards import PricingGuard, validate_simulation_output
from mcos_tpu.engine.regime import (
    MarketRegime,
    RegimeDetector,
    compute_iv_percentile,
    compute_realized_vol,
    compute_skew_slope,
    rolling_realized_vol,
)
from mcos_tpu.engine.risk import (
    HedgingBacktest,
    LiquidityStress,
    StressTestEngine,
    compute_risk_metrics,
    multi_asset_gbm_terminal,
    portfolio_var,
)
from mcos_tpu.models.params import SVJParams, gbm_params

SPOT, STRIKE, T = 22500.0, 22500.0, 0.1
SVJ = SVJParams(kappa=3.0, theta=0.04, xi=0.3, rho=-0.6, v0=0.04,
                lambda_j=1.0, mu_j=-0.05, sigma_j=0.1)


# ── risk metrics ─────────────────────────────────────────────────────────────
def test_risk_metrics_normal_sample():
    rng = np.random.default_rng(42)
    returns = rng.standard_normal(10_000) * 0.02 - 0.001
    m = compute_risk_metrics(returns)
    # 99% normal VaR ≈ 2.326σ − μ.
    assert m["var"] == pytest.approx(2.326 * 0.02 + 0.001, rel=0.1)
    assert m["cvar"] > m["var"]
    assert abs(m["skewness"]) < 0.1
    assert m["kurtosis"] == pytest.approx(3.0, abs=0.2)
    assert np.isfinite(m["tail_index"])


def test_risk_metrics_fat_tails():
    rng = np.random.default_rng(0)
    heavy = rng.standard_t(df=3, size=20_000)
    m = compute_risk_metrics(heavy)
    assert m["excess_kurtosis"] > 1.0
    # Hill index should sit near the true tail exponent (3) for Student-t.
    assert 1.5 < m["tail_index"] < 6.0


# ── stress testing ───────────────────────────────────────────────────────────
@pytest.fixture(scope="module")
def stress():
    return StressTestEngine(SVJ, num_paths=20_000, seed=1)


def test_spot_ladder_monotone_for_calls(stress):
    ladder = stress.spot_shock_ladder(SPOT, STRIKE, T, is_call=True)
    assert len(ladder) == 6
    prices = [row["price"] for row in ladder]
    assert all(a < b for a, b in zip(prices, prices[1:]))  # calls ↑ in spot
    assert ladder[0]["pnl"] < 0 < ladder[-1]["pnl"]


def test_vol_ladder_sign(stress):
    ladder = stress.vol_shock_ladder(SPOT, STRIKE, T)
    assert len(ladder) == 2
    down, up = ladder
    assert down["pnl"] < 0 < up["pnl"]  # long option: short vol shock hurts


def test_jump_scenario_keys(stress):
    j = stress.jump_scenario(SPOT, STRIKE, T)
    assert j["gap_size_pct"] == pytest.approx(4.0)
    assert j["gap_down_pnl"] < 0 < j["gap_up_pnl"]  # ATM call


def test_full_report(stress):
    rep = stress.full_stress_report(SPOT, STRIKE, T)
    assert set(rep) == {"spot_shocks", "vol_shocks", "jump_scenario"}


def test_spot_ladder_matches_loop(stress):
    """The batched payoff-axis ladder must reproduce shock-by-shock engine
    re-pricing: max((1+s)S_T − K) = (1+s)·max(S_T − K/(1+s)) pathwise, so
    with CRN the two differ only by f32 rounding."""
    from mcos_tpu.engine.pricer import MonteCarloEngine

    ladder = stress.spot_shock_ladder(SPOT, STRIKE, T, is_call=True)
    eng = MonteCarloEngine(SVJ, num_paths=stress.num_paths,
                           num_steps=stress.num_steps, seed=stress.seed,
                           use_sobol=False)
    for row in ladder:
        looped = eng.price(row["spot"], STRIKE, T, True)["price"]
        assert row["price"] == pytest.approx(looped, rel=2e-4)


def test_vol_ladder_matches_loop(stress):
    """The vmapped params batch must agree with member-by-member pricing
    (same key => same draws; identical estimator)."""
    import jax.numpy as jnp

    from mcos_tpu.config import VOL_SHOCKS, scaled_steps
    from mcos_tpu.engine.pricer import mc_price_core

    ladder = stress.vol_shock_ladder(SPOT, STRIKE, T)
    for shock, row in zip(VOL_SHOCKS, ladder):
        p = SVJ.replace(v0=row["v0"],
                        theta=max(float(SVJ.theta) + shock**2, 0.001))
        res = mc_price_core(
            p, SPOT, jnp.asarray([STRIKE], jnp.float32), T,
            jax.random.key(stress.seed),
            num_paths=stress.num_paths,
            num_steps=scaled_steps(stress.num_steps, T), is_call=True)
        assert row["price"] == pytest.approx(float(res["price"][0]), rel=1e-5)


def test_scenario_matrix_consistency(stress):
    """The spot×vol cube's zero-vol-shock row must reproduce the spot
    ladder and its zero-spot-shock column the vol ladder (same CRN key,
    same shock mapping — only the batching differs)."""
    m = stress.scenario_matrix(SPOT, STRIKE, T, is_call=True)
    i0 = m["vol_shocks_pts"].index(0.0)
    j0 = m["spot_shocks_pct"].index(0.0)
    assert m["base_price"] == pytest.approx(m["prices"][i0][j0])

    ladder = stress.spot_shock_ladder(SPOT, STRIKE, T, is_call=True)
    by_pct = {round(r["shock_pct"], 6): r["price"] for r in ladder}
    for j, pct in enumerate(m["spot_shocks_pct"]):
        if round(pct, 6) in by_pct:
            assert m["prices"][i0][j] == pytest.approx(
                by_pct[round(pct, 6)], rel=1e-5)

    vladder = stress.vol_shock_ladder(SPOT, STRIKE, T)
    by_vol = {round(r["vol_shock"], 6): r["price"] for r in vladder}
    for i, pts in enumerate(m["vol_shocks_pts"]):
        if round(pts, 6) in by_vol:
            assert m["prices"][i][j0] == pytest.approx(
                by_vol[round(pts, 6)], rel=1e-5)

    # Call prices are monotone along the spot axis at every vol level.
    for row in m["prices"]:
        assert all(a < b for a, b in zip(row, row[1:]))


def test_scenario_matrix_custom_axes(stress):
    """Custom shock axes get a zero inserted on each axis; P&L anchors at
    the unshocked cell."""
    m = stress.scenario_matrix(SPOT, STRIKE, T, spot_shocks=[-0.1, 0.1],
                               vol_shocks=[0.03])
    assert m["spot_shocks_pct"] == [-10.0, 0.0, 10.0]
    assert m["vol_shocks_pts"] == [0.0, 3.0]
    i0, j0 = 0, 1
    assert m["pnl"][i0][j0] == pytest.approx(0.0, abs=1e-9)
    assert len(m["prices"]) == 2 and len(m["prices"][0]) == 3
    # Long-vol cell: positive vol shock with no spot move gains.
    assert m["pnl"][1][1] > 0


# ── liquidity stress ─────────────────────────────────────────────────────────
def test_liquidity_stress():
    w = LiquidityStress.bid_ask_widening(2.0, 3.0)
    assert w["stressed_spread"] == 6.0
    vg = LiquidityStress.vol_gap_no_spot_move(SVJ, 0.05)
    assert float(vg.v0) == pytest.approx((0.2 + 0.05) ** 2, rel=1e-6)
    crush = LiquidityStress.expiry_vol_crush(SVJ, 0.30)
    assert float(crush.v0) == pytest.approx(0.04 * 0.7, rel=1e-6)
    assert float(crush.theta) == pytest.approx(0.04 * 0.85, rel=1e-6)


# ── hedging backtest ─────────────────────────────────────────────────────────
def test_hedging_backtest():
    p = gbm_params(0.2, r=0.065, q=0.012)
    bt = HedgingBacktest(p, seed=3)
    res = bt.run_backtest(SPOT, STRIKE, 0.1, num_scenarios=500,
                          num_mc_paths=20_000)
    # Delta-hedging a fairly-priced short option in its own model: PnL
    # centered near zero (minus costs), tight relative to the premium.
    assert abs(res["mean_pnl"]) < 0.2 * res["premium"]
    assert res["std_pnl"] < 0.5 * res["premium"]
    assert res["pnl_percentiles"]["1%"] < res["pnl_percentiles"]["99%"]
    assert res["total_txn_cost_avg"] > 0
    assert res["num_scenarios"] == 500


# ── multi-asset / portfolio VaR ──────────────────────────────────────────────
def test_multi_asset_correlation_recovered():
    corr = np.array([[1.0, 0.8], [0.8, 1.0]], np.float32)
    s = multi_asset_gbm_terminal(
        np.array([100.0, 200.0]), np.array([0.2, 0.3]), corr, 0.0, 0.0, 1.0,
        jax.random.key(0), num_paths=100_000, num_steps=16)
    lr = np.log(np.asarray(s) / np.array([100.0, 200.0]))
    est = np.corrcoef(lr[:, 0], lr[:, 1])[0, 1]
    assert est == pytest.approx(0.8, abs=0.02)
    assert np.std(lr[:, 0]) == pytest.approx(0.2, rel=0.05)


def test_portfolio_var_diversification():
    spots = np.array([100.0, 100.0])
    sigmas = np.array([0.25, 0.25])
    w = np.array([0.5, 0.5])
    kw = dict(T=0.25, num_paths=100_000, num_steps=8)
    v_corr = portfolio_var(spots, sigmas, np.array([[1, .95], [.95, 1]],
                                                   np.float32), w, **kw)
    v_ind = portfolio_var(spots, sigmas, np.eye(2, dtype=np.float32), w, **kw)
    assert v_ind["var"] < v_corr["var"]  # diversification lowers VaR


# ── regime detection ─────────────────────────────────────────────────────────
def test_regime_canned_inputs():
    det = RegimeDetector()
    assert det.classify(0.12, 25, 0.02)["regime"] == "calm"
    assert det.classify(0.22, 60, 0.06)["regime"] == "event"
    assert det.classify(0.35, 85, 0.12)["regime"] == "crisis"
    assert len(det.get_regime_history()) == 3


def test_regime_adjustments_widen_with_stress():
    det = RegimeDetector()
    calm = det.classify(0.1, 10, 0.01)["calibration_adjustments"]
    crisis = det.classify(0.4, 90, 0.15)["calibration_adjustments"]
    assert crisis["xi_bounds"][1] > calm["xi_bounds"][1]
    assert crisis["lambda_bounds"][1] > calm["lambda_bounds"][1]
    assert crisis["regularization_scale"] < calm["regularization_scale"]


def test_regime_helpers():
    prices = 100 * np.exp(np.cumsum(np.random.default_rng(1).normal(
        0, 0.01, 100)))
    rv = compute_realized_vol(prices)
    assert rv == pytest.approx(0.01 * np.sqrt(252), rel=0.5)
    roll = rolling_realized_vol(prices)
    assert roll.shape == (80,)
    assert compute_iv_percentile(0.2, np.linspace(0.1, 0.3, 100)) == pytest.approx(50, abs=2)
    assert compute_iv_percentile(0.2, np.array([])) == 50.0
    assert compute_skew_slope(0.25, 0.20) == pytest.approx(0.05)


# ── guards ───────────────────────────────────────────────────────────────────
def test_pre_price_guard_passes_sane_params():
    g = PricingGuard(SVJ)
    res = g.check_pre_price(SPOT, STRIKE, T)
    assert res["pass"]


def test_pre_price_guard_rejects_bad_params():
    g = PricingGuard(SVJ.replace(v0=50.0))
    assert not g.check_pre_price(SPOT, STRIKE, T)["pass"]
    g2 = PricingGuard(SVJ.replace(rho=-0.9999))
    assert not g2.check_pre_price(SPOT, STRIKE, T)["pass"]
    g3 = PricingGuard(SVJ)
    assert not g3.check_pre_price(SPOT, STRIKE, -0.1)["pass"]


def test_pre_price_guard_alerts():
    g = PricingGuard(SVJ.replace(xi=4.5))
    res = g.check_pre_price(SPOT, SPOT * 2, T)  # deep OTM + high ξ
    assert res["pass"]  # alerts, not failures
    assert any("Moneyness" in a for a in res["alerts"])
    assert any("ξ" in a for a in res["alerts"])
    assert any("Feller" in a for a in res["alerts"])


def test_post_price_guard():
    g = PricingGuard(SVJ)
    ok = g.check_post_price(
        {"price": 300.0, "std_error": 0.1}, SPOT, STRIKE, T)
    assert ok["pass"]
    bad = g.check_post_price(
        {"price": SPOT * 2.0, "std_error": 0.1}, SPOT, STRIKE, T)
    assert not bad["pass"]
    neg = g.check_post_price({"price": -5.0, "std_error": 0.1},
                             SPOT, STRIKE, T)
    assert not neg["pass"]


def test_validate_simulation_output():
    rng = np.random.default_rng(0)
    s = rng.lognormal(0, 0.2, 1000).astype(np.float32) * 100
    v = np.abs(rng.normal(0.04, 0.01, 1000)).astype(np.float32)
    out = validate_simulation_output(s, v)
    assert out["valid"]
    s_bad = s.copy()
    s_bad[0] = np.nan
    out2 = validate_simulation_output(s_bad, v)
    assert not out2["valid"]
    assert any("NaN" in i for i in out2["issues"])


def test_hedge_backtest_svj_dynamics_fatter_left_tail():
    """Hedging a short option with a BS delta in the TRUE SVJ world must be
    riskier than in the reference's GBM world: jumps gap through the hedge,
    so the left tail of the PnL widens."""
    from mcos_tpu.engine.risk import HedgingBacktest

    p = SVJParams(kappa=3.0, theta=0.04, xi=0.4, rho=-0.6, v0=0.04,
                  lambda_j=3.0, mu_j=-0.06, sigma_j=0.08)
    bt = HedgingBacktest(p, seed=2)
    kw = dict(num_scenarios=3000, num_mc_paths=20_000)
    gbm = bt.run_backtest(22500.0, 22500.0, 0.1, **kw)
    svj = bt.run_backtest(22500.0, 22500.0, 0.1, dynamics="svj", **kw)
    assert gbm["dynamics"] == "gbm" and svj["dynamics"] == "svj"
    assert svj["std_pnl"] > gbm["std_pnl"]
    assert svj["pnl_percentiles"]["1%"] < gbm["pnl_percentiles"]["1%"]


# ── Euler risk contributions (component VaR / CVaR) ──────────────────────────
def test_risk_contributions_tie_out():
    """Σ component_cvar = CVaR exactly (tail-mean identity); Σ component_var
    = VaR after the band rescale with a near-1 scale; both consistent with
    portfolio_var on the same key."""
    from mcos_tpu.engine.risk import portfolio_risk_contributions

    spots = np.array([100.0, 80.0, 120.0], np.float32)
    sigmas = np.array([0.2, 0.3, 0.25], np.float32)
    corr = np.eye(3) * 0.6 + 0.4
    w = np.array([0.5, 0.3, 0.2], np.float32)
    kw = dict(T=0.1, key=jax.random.key(3), num_paths=400_000, num_steps=16)
    out = portfolio_risk_contributions(spots, sigmas, corr, w, **kw)
    assert sum(out["component_cvar"]) == pytest.approx(out["cvar"], rel=1e-4)
    assert sum(out["component_var"]) == pytest.approx(out["var"], rel=1e-6)
    assert out["var_scale"] == pytest.approx(1.0, abs=0.15)
    ref = portfolio_var(spots, sigmas, corr, w, **kw)
    assert out["var"] == pytest.approx(ref["var"], rel=0.02)
    assert out["cvar"] == pytest.approx(ref["cvar"], rel=0.02)


def test_risk_contributions_match_normal_oracle():
    """Short-horizon GBM ⇒ returns ≈ multivariate normal, where Euler
    contributions are analytic: componentᵢ/risk = wᵢ(Σw)ᵢ / wᵀΣw for BOTH
    VaR and CVaR (elliptical distribution)."""
    from mcos_tpu.engine.risk import portfolio_risk_contributions

    spots = np.array([100.0, 100.0, 100.0], np.float32)
    sigmas = np.array([0.2, 0.35, 0.15], np.float32)
    corr = np.array([[1.0, 0.5, 0.1], [0.5, 1.0, 0.3], [0.1, 0.3, 1.0]])
    w = np.array([0.4, 0.35, 0.25])
    T = 0.05
    cov = np.outer(sigmas, sigmas) * corr * T
    expected_pct = w * (cov @ w) / (w @ cov @ w) * 100
    out = portfolio_risk_contributions(
        spots, sigmas, corr, w, T=T, key=jax.random.key(9),
        num_paths=500_000, num_steps=16)
    np.testing.assert_allclose(out["component_cvar_pct"], expected_pct,
                               atol=2.5)
    np.testing.assert_allclose(out["component_var_pct"], expected_pct,
                               atol=4.0)


def test_risk_contributions_zero_weight_asset():
    """A zero-weight asset contributes nothing (component = 0) but keeps a
    finite marginal (it WOULD add risk if bought — correlation with the
    book)."""
    from mcos_tpu.engine.risk import portfolio_risk_contributions

    spots = np.array([100.0, 100.0], np.float32)
    sigmas = np.array([0.25, 0.25], np.float32)
    corr = np.eye(2) * 0.3 + 0.7
    w = np.array([1.0, 0.0])
    out = portfolio_risk_contributions(
        spots, sigmas, corr, w, T=0.1, key=jax.random.key(1),
        num_paths=200_000, num_steps=16)
    assert out["component_cvar"][1] == pytest.approx(0.0, abs=1e-9)
    assert out["marginal_cvar"][1] > 0.5 * out["marginal_cvar"][0]


# ─────────────────────────────────────────────────────────────────────────────
# Student-t copula portfolio risk
# ─────────────────────────────────────────────────────────────────────────────
def test_t_copula_preserves_lognormal_marginals():
    from mcos_tpu.engine.risk import multi_asset_t_copula_terminal
    spots = np.array([100.0, 50.0], np.float32)
    sigmas = np.array([0.2, 0.3], np.float32)
    corr = np.array([[1.0, 0.5], [0.5, 1.0]])
    s = multi_asset_t_copula_terminal(
        spots, sigmas, corr, 0.05, 0.0, 0.25, jax.random.key(0),
        num_paths=300_000, nu=4.0)
    lr = np.log(np.asarray(s) / spots)
    for i in range(2):
        mu = (0.05 - 0.5 * sigmas[i] ** 2) * 0.25
        sd = sigmas[i] * np.sqrt(0.25)
        assert lr[:, i].mean() == pytest.approx(mu, abs=4 * sd / np.sqrt(3e5))
        assert lr[:, i].std() == pytest.approx(sd, rel=5e-3)


def test_t_copula_var_exceeds_gaussian_and_is_monotone_in_nu():
    from mcos_tpu.engine.risk import portfolio_var
    spots = [100.0, 50.0, 200.0, 80.0]
    sigmas = [0.2, 0.3, 0.25, 0.35]
    corr = np.full((4, 4), 0.4)
    np.fill_diagonal(corr, 1.0)
    w = [0.25] * 4
    kw = dict(num_paths=400_000, key=jax.random.key(7))
    fat = portfolio_var(spots, sigmas, corr, w, 0.25, copula="student_t",
                        nu=3.0, **kw)
    mild = portfolio_var(spots, sigmas, corr, w, 0.25, copula="student_t",
                         nu=50.0, **kw)
    gauss = portfolio_var(spots, sigmas, corr, w, 0.25, num_steps=8, **kw)
    assert fat["cvar"] > mild["cvar"]          # fatter joint tail
    assert fat["cvar"] > gauss["cvar"] * 1.02  # materially above Gaussian
    # nu = 50 is within MC noise of the Gaussian copula
    assert mild["var"] == pytest.approx(gauss["var"], rel=0.02)
    assert fat["copula"] == "student_t" and fat["nu"] == 3.0


def test_var_endpoint_t_copula():
    from mcos_tpu.api.server import handle_var
    corr = [[1.0, 0.4], [0.4, 1.0]]
    body = {"spots": [100.0, 50.0], "sigmas": [0.25, 0.3],
            "weights": [0.5, 0.5], "corr": corr, "T": 0.25,
            "num_paths": 100_000, "copula": "student_t", "nu": 4.0}
    out = handle_var(body)
    assert out["copula"] == "student_t"
    assert out["var"] > 0 and out["cvar"] >= out["var"]


def test_hedging_backtest_rough_dynamics():
    """dynamics='rough' replays a rough-Bergomi world from a pre-simulated
    exact-covariance sheet: delta-only replication must show materially
    fatter hedging-error tails than the GBM world at the same vol level
    (stochastic rough vol is exactly what a BS delta cannot hedge)."""
    from mcos_tpu.engine.risk import HedgingBacktest
    from mcos_tpu.models.params import gbm_params

    bt = HedgingBacktest(gbm_params(0.2, r=0.05, q=0.01), seed=7)
    kw = dict(num_scenarios=3000, num_mc_paths=30_000)
    g = bt.run_backtest(100.0, 100.0, 0.25, dynamics="gbm", **kw)
    r = bt.run_backtest(100.0, 100.0, 0.25, dynamics="rough", **kw)
    assert r["std_pnl"] > 2.0 * g["std_pnl"]
    assert r["pnl_percentiles"]["1%"] < 2.0 * g["pnl_percentiles"]["1%"]
    assert np.isfinite(r["mean_pnl"])
    assert r["dynamics"] == "rough"
