"""Greeks engine: AD values vs closed-form BS in the degenerate limit, and
AD-vs-CRN-FD consistency on full SVJ (the reference's own oracle,
greeks.py:79-95 diff_pct)."""

import numpy as np
import pytest

from mcos_tpu.engine.greeks import GreeksEngine
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops import bs

SPOT, STRIKE, T = 22500.0, 22500.0, 0.25
SIGMA = 0.2
R, Q = 0.065, 0.012


@pytest.fixture(scope="module")
def bs_engine():
    return GreeksEngine(gbm_params(SIGMA, r=R, q=Q),
                        num_paths=50_000, num_steps=128, seed=5)


@pytest.fixture(scope="module")
def svj_engine():
    p = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                  lambda_j=1.0, mu_j=-0.05, sigma_j=0.1)
    return GreeksEngine(p, num_paths=50_000, num_steps=128, seed=5)


def test_delta_matches_bs(bs_engine):
    d = bs_engine.delta(SPOT, STRIKE, T)
    ref = float(bs.bs_delta(SPOT, STRIKE, T, R, Q, SIGMA, True))
    assert d["pathwise"] == pytest.approx(ref, abs=0.01)
    assert d["diff_pct"] < 3.0  # AD vs CRN-FD agree (reference's own metric)


def test_put_delta_matches_bs(bs_engine):
    d = bs_engine.delta(SPOT, STRIKE, T, is_call=False)
    ref = float(bs.bs_delta(SPOT, STRIKE, T, R, Q, SIGMA, False))
    assert d["pathwise"] == pytest.approx(ref, abs=0.01)


def test_vega_matches_bs(bs_engine):
    v = bs_engine.vega(SPOT, STRIKE, T)
    # dP/dv0 = vega_sigma / (2σ) in the BS limit.
    ref_v0 = float(bs.bs_vega(SPOT, STRIKE, T, R, Q, SIGMA)) / (2 * SIGMA)
    assert v["ad_vega_v0"] == pytest.approx(ref_v0, rel=0.08)
    assert v["diff_pct"] < 10.0


def test_gamma_matches_bs(bs_engine):
    g = bs_engine.gamma(SPOT, STRIKE, T)
    ref = float(bs.bs_gamma(SPOT, STRIKE, T, R, Q, SIGMA))
    assert g["gamma"] == pytest.approx(ref, rel=0.15)


def test_theta_matches_bs(bs_engine):
    t = bs_engine.theta(SPOT, STRIKE, T)
    ref = float(bs.bs_theta(SPOT, STRIKE, T, R, Q, SIGMA, True))
    # reference convention: 'theta_daily' holds the annualized decay rate.
    assert t["theta_daily"] == pytest.approx(ref, rel=0.05)
    assert t["theta_annual"] == pytest.approx(ref * 252, rel=0.05)


def test_rho_matches_bs(bs_engine):
    r = bs_engine.rho(SPOT, STRIKE, T)
    ref = float(bs.bs_rho(SPOT, STRIKE, T, R, Q, SIGMA, True))
    assert r["rho"] == pytest.approx(ref, rel=0.05)


def test_svj_ad_fd_consistency(svj_engine):
    """On full SVJ there is no closed form — AD must agree with CRN-FD."""
    d = svj_engine.delta(SPOT, STRIKE, T)
    assert d["diff_pct"] < 5.0
    v = svj_engine.vega(SPOT, STRIKE, T)
    assert v["diff_pct"] < 15.0  # FD bump 0.01 on v0=0.04 has O(h²) curvature


def test_jump_sensitivities(svj_engine):
    j = svj_engine.jump_sensitivities(SPOT, STRIKE, T)
    # More frequent crash-jumps raise ATM option value via fatter tails; the
    # CRN-FD lambda sensitivity must dominate the drift-only AD term.
    assert np.isfinite(j["lambda_j"])
    assert abs(j["lambda_j"] - j["lambda_j_drift_only"]) > 1e-3
    # Wider jump sizes add convexity value.
    assert j["sigma_j"] > 0


def test_all_greeks_layout(svj_engine):
    g = svj_engine.all_greeks(SPOT, STRIKE, T)
    assert set(g) == {"delta", "vega", "gamma", "theta", "rho", "jumps",
                      "model"}
    assert "pathwise" in g["delta"] and "finite_diff" in g["delta"]
    assert "vega_per_vol_point" in g["vega"]
    assert "gamma" in g["gamma"]
    assert "theta_daily" in g["theta"] and "rho" in g["rho"]


def test_lambda_lr_agrees_with_crn_fd():
    """Score-function lambda-greek vs the CRN finite difference: two
    independent estimators of the same quantity."""
    from mcos_tpu.engine.greeks import lambda_lr_estimate
    import jax

    p = SVJParams(kappa=3.0, theta=0.05, xi=0.3, rho=-0.5, v0=0.04,
                  lambda_j=2.0, mu_j=-0.08, sigma_j=0.15)
    eng = GreeksEngine(p, num_paths=200_000, num_steps=128, seed=11)
    j = eng.jump_sensitivities(SPOT, SPOT, 0.5, bump=0.25)
    assert "lambda_j_lr" in j
    # LR and CRN-FD must agree within the LR noise band (LR is noisier).
    tol = max(5 * j["lambda_j_lr_se"], 0.3 * abs(j["lambda_j"]))
    assert abs(j["lambda_j_lr"] - j["lambda_j"]) < tol
    # Crash-jumps with negative mean size raise ATM value: positive vega-like.
    assert j["lambda_j"] > 0


def test_all_greeks_single_device_program(monkeypatch):
    """all_greeks must run as ONE fused device program (+ memo): the seven
    result blocks share one dispatch, a repeat identical call executes
    nothing, and mutating engine state invalidates cleanly."""
    import mcos_tpu.engine.greeks as gmod

    calls = {"fused": 0}
    real_fused = gmod._all_greeks_device

    def counting_fused(*a, **kw):
        calls["fused"] += 1
        return real_fused(*a, **kw)

    monkeypatch.setattr(gmod, "_all_greeks_device", counting_fused)

    p = SVJParams(kappa=3.0, theta=0.05, xi=0.3, rho=-0.5, v0=0.04,
                  lambda_j=1.0, mu_j=-0.05, sigma_j=0.10)
    eng = GreeksEngine(p, num_paths=20_000, num_steps=16, seed=3)
    g1 = eng.all_greeks(SPOT, STRIKE, 0.1)
    assert calls["fused"] == 1

    # A repeated identical request is a pure memo hit: zero new dispatches.
    g2 = eng.all_greeks(SPOT, STRIKE, 0.1)
    assert calls["fused"] == 1
    assert g1 == g2

    # Mutating engine state invalidates the memo (fresh pass, not stale).
    eng.params = p.replace(v0=0.05)
    g3 = eng.all_greeks(SPOT, STRIKE, 0.1)
    assert calls["fused"] == 2
    assert g3["vega"]["ad_vega_v0"] != g1["vega"]["ad_vega_v0"]

    # The fused prefetch and the individual block paths agree: a fresh
    # engine whose blocks are called directly must reproduce the numbers.
    # CRN makes them the same estimator on the same draws; the fused v2
    # program reaches the FD ingredients through different XLA fusions
    # (payoff algebra on shared terminals vs standalone re-simulation), so
    # the match is to f32 reassociation noise, not bitwise.
    eng2 = GreeksEngine(p, num_paths=20_000, num_steps=16, seed=3)
    d = eng2.delta(SPOT, STRIKE, 0.1)
    v = eng2.vega(SPOT, STRIKE, 0.1)
    gm = eng2.gamma(SPOT, STRIKE, 0.1)
    j = eng2.jump_sensitivities(SPOT, STRIKE, 0.1)

    def close(a, b, keys):
        for k in keys:
            assert a[k] == pytest.approx(b[k], rel=2e-4, abs=1e-5), k

    close(d, g1["delta"], ("pathwise", "finite_diff"))
    close(v, g1["vega"], ("ad_vega_v0", "fd_vega_v0", "vega_per_vol_point"))
    close(gm, g1["gamma"], ("gamma", "price_up", "price_base", "price_down"))
    close(j, g1["jumps"], ("lambda_j", "mu_j", "sigma_j"))


# ── Cross Greeks (vanna / volga) ─────────────────────────────────────────────
def _bs_cross_oracle():
    """Exact BS vanna/volga via second-order AD of the closed form (smooth —
    no kink, so raw second-order AD is exact here, unlike the MC payoff)."""
    import jax

    def price(s, sig):
        return bs.bs_price(s, STRIKE, T, R, Q, sig, True)

    vanna = float(jax.grad(jax.grad(price, argnums=0), argnums=1)(
        SPOT, SIGMA))
    volga = float(jax.grad(jax.grad(price, argnums=1), argnums=1)(
        SPOT, SIGMA))
    return vanna, volga


def test_cross_greeks_match_bs(bs_engine):
    cg = bs_engine.cross_greeks(SPOT, STRIKE, T)
    vanna_ref, volga_ref = _bs_cross_oracle()
    assert cg["vanna"] == pytest.approx(vanna_ref, rel=0.15)
    assert cg["volga"] == pytest.approx(volga_ref, rel=0.15)
    # Schwarz symmetry: the two FD routes to vanna agree.
    assert cg["vanna"] == pytest.approx(cg["vanna_cross_check"], rel=0.15)


def test_cross_greeks_svj_finite(svj_engine):
    cg = svj_engine.cross_greeks(SPOT, STRIKE, T)
    for k, v in cg.items():
        assert np.isfinite(v), k
    # ATM vanilla: volga is small but vanna should be clearly nonzero
    # under a skewed smile-consistent model once we move off-ATM.
    cg_otm = svj_engine.cross_greeks(SPOT, SPOT * 1.08, T)
    assert abs(cg_otm["vanna"]) > 0


def test_all_greeks_chain_matches_per_contract():
    """The pipelined chain path must return the same numbers as the
    per-contract all_greeks (same fused program, same CRN key — only the
    synchronization pattern differs)."""
    p = SVJParams(kappa=3.0, theta=0.05, xi=0.3, rho=-0.5, v0=0.04,
                  lambda_j=1.0, mu_j=-0.05, sigma_j=0.10)
    strikes = [21500.0, 22500.0, 23500.0]
    eng = GreeksEngine(p, num_paths=20_000, num_steps=16, seed=3)
    chain = eng.all_greeks_chain(SPOT, strikes, 0.1)
    assert [c["strike"] for c in chain] == strikes
    eng2 = GreeksEngine(p, num_paths=20_000, num_steps=16, seed=3)
    for c in chain:
        one = eng2.all_greeks(SPOT, c["strike"], 0.1)
        assert c["delta"] == one["delta"]
        assert c["vega"] == one["vega"]
        assert c["gamma"] == one["gamma"]
        assert c["jumps"] == one["jumps"]


def test_fused_lr_se_is_calibrated():
    """The fused LR lambda stderr must be the stderr over n iid antithetic
    PAIRS (the score is shared within a pair): replicated estimates'
    empirical spread should match the reported se, not be ~sqrt(2) wider
    (the bug this pins: std over 2n pairwise-correlated values / sqrt(2n))."""
    p = SVJParams(kappa=3.0, theta=0.05, xi=0.3, rho=-0.5, v0=0.04,
                  lambda_j=2.0, mu_j=-0.08, sigma_j=0.15)
    vals, ses = [], []
    for s in range(24):
        eng = GreeksEngine(p, num_paths=4_000, num_steps=16, seed=300 + s)
        eng.all_greeks(SPOT, SPOT, 0.5)  # fused prefetch fills the lr memo
        j = eng.jump_sensitivities(SPOT, SPOT, 0.5)
        vals.append(j["lambda_j_lr"])
        ses.append(j["lambda_j_lr_se"])
    ratio = float(np.mean(ses) / np.std(vals, ddof=1))
    assert 0.75 < ratio < 1.45, f"LR se miscalibrated: {ratio:.3f}"


# ── Second/third-order Greeks (charm / speed / zomma / color / veta) ─────────
def _bs_second_order_oracle():
    """Exact BS charm/speed/zomma/color/veta via higher-order AD of the
    smooth closed form (same recipe as _bs_cross_oracle)."""
    import jax

    def price(s, sig, t):
        return bs.bs_price(s, STRIKE, t, R, Q, sig, True)

    d_s = jax.grad(price, argnums=0)
    gamma = jax.grad(d_s, argnums=0)
    args = (SPOT, SIGMA, T)
    return {
        "charm": -float(jax.grad(d_s, argnums=2)(*args)),
        "speed": float(jax.grad(gamma, argnums=0)(*args)),
        "zomma": float(jax.grad(gamma, argnums=1)(*args)),
        "color": -float(jax.grad(gamma, argnums=2)(*args)),
        "veta": -float(jax.grad(jax.grad(price, argnums=1),
                                argnums=2)(*args)),
    }


def test_second_order_greeks_match_bs(bs_engine):
    """ξ=0 exactly ⇒ the companion-CV estimator collapses to the analytic
    BS value pathwise, so the CRN differences of AD first derivatives
    reproduce closed-form higher-order Greeks tightly."""
    so = bs_engine.second_order_greeks(SPOT, STRIKE, T)
    ref = _bs_second_order_oracle()
    assert so["charm"] == pytest.approx(ref["charm"], rel=0.05)
    assert so["speed"] == pytest.approx(ref["speed"], rel=0.10)
    assert so["zomma"] == pytest.approx(ref["zomma"], rel=0.10)
    assert so["color"] == pytest.approx(ref["color"], rel=0.10)
    assert so["veta"] == pytest.approx(ref["veta"], rel=0.10)
    # Internal consistency: the gamma implied by the same batch matches
    # the engine's own gamma block.
    g = bs_engine.gamma(SPOT, STRIKE, T)
    assert so["gamma_check"] == pytest.approx(g["gamma"], rel=0.05)
    assert so["charm_daily"] == pytest.approx(so["charm"] / 252)


def test_second_order_greeks_svj_finite(svj_engine):
    so = svj_engine.second_order_greeks(SPOT, STRIKE, T)
    for k, v in so.items():
        assert np.isfinite(v), k
    # Speed and zomma should be clearly nonzero off-ATM under full SVJ.
    so_otm = svj_engine.second_order_greeks(SPOT, SPOT * 1.08, T)
    assert abs(so_otm["speed"]) > 0
    assert abs(so_otm["zomma"]) > 0
