"""Double-barrier (corridor) products: image-series oracles, bridge-MC
exactness at coarse steps, per-path in-out parity, corridor digitals,
pathwise AD Greeks, sharded pricing.

The oracle chain: `double_barrier_bs` / `double_no_touch_bs` integrate the
method-of-images corridor density (host f64, exact to quadrature precision)
and are themselves pinned against the single-barrier Reiner-Rubinstein /
reflection closed forms in their limits — so the MC tests never rely on a
formula that isn't independently verified here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcos_tpu.engine.exotics import ExoticEngine
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops import exotics as ops_exotics
from mcos_tpu.ops.bs import bs_price

S, K, T = 100.0, 100.0, 0.5
R, Q, SIGMA = 0.05, 0.01, 0.3
LO, HI = 85.0, 125.0


@pytest.fixture(scope="module")
def gbm_engine():
    return ExoticEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=150_000,
                        num_steps=32, seed=7)


# ─────────────────────────────────────────────────────────────────────────────
# Oracle self-consistency (f64, no MC)
# ─────────────────────────────────────────────────────────────────────────────
def test_oracle_single_barrier_limits():
    """Corridor quadrature ⇒ Reiner-Rubinstein when one barrier is removed."""
    a = ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA, 80.0, 1e6,
                                      is_call=True, knock="out")
    b = ops_exotics.barrier_bs(S, K, T, R, Q, SIGMA, 80.0, is_call=True,
                               knock="out", direction="down")
    assert a == pytest.approx(b, abs=1e-9)
    a = ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA, 1e-4, 120.0,
                                      is_call=False, knock="out")
    b = ops_exotics.barrier_bs(S, K, T, R, Q, SIGMA, 120.0, is_call=False,
                               knock="out", direction="up")
    assert a == pytest.approx(b, abs=1e-9)


def test_oracle_in_out_parity_and_orderings():
    ko = ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA, LO, HI,
                                       knock="out")
    ki = ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA, LO, HI,
                                       knock="in")
    vanilla = float(bs_price(S, K, T, R, Q, SIGMA, True))
    assert ko + ki == pytest.approx(vanilla, rel=1e-6)
    # tighter corridor ⇒ cheaper KO; double KO ≤ either single KO
    ko_tight = ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA,
                                             90.0, 115.0, knock="out")
    assert ko_tight < ko
    up_ko = ops_exotics.barrier_bs(S, K, T, R, Q, SIGMA, HI, knock="out",
                                   direction="up")
    down_ko = ops_exotics.barrier_bs(S, K, T, R, Q, SIGMA, LO, knock="out",
                                     direction="down")
    assert ko <= min(up_ko, down_ko) + 1e-12
    # started through a barrier ⇒ KO worthless, KI = vanilla
    assert ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA, 101.0, HI,
                                         knock="out") == 0.0
    assert ops_exotics.double_barrier_bs(
        S, K, T, R, Q, SIGMA, 101.0, HI, knock="in") == pytest.approx(
            vanilla, rel=1e-6)


def test_oracle_dnt_limits_and_complement():
    dnt = ops_exotics.double_no_touch_bs(S, T, R, Q, SIGMA, 80.0, 1e6)
    ref = np.exp(-R * T) - ops_exotics.one_touch_bs(S, T, R, Q, SIGMA, 80.0,
                                                    direction="down")
    assert dnt == pytest.approx(ref, abs=1e-9)
    # stay probability in (0, 1); widens with the corridor
    wide = ops_exotics.double_no_touch_bs(S, T, R, Q, SIGMA, 50.0, 200.0)
    tight = ops_exotics.double_no_touch_bs(S, T, R, Q, SIGMA, 95.0, 105.0)
    assert 0.0 < tight < dnt < wide < np.exp(-R * T) + 1e-12


# ─────────────────────────────────────────────────────────────────────────────
# Corridor survival increment
# ─────────────────────────────────────────────────────────────────────────────
def test_corridor_increment_single_barrier_limit():
    """Far lower barrier ⇒ corridor survival == single up-barrier survival
    (same key, per-path weights)."""
    p = gbm_params(SIGMA, r=R, q=Q)
    key = jax.random.key(0)
    common = dict(num_paths=50_000, num_steps=16, antithetic=True,
                  companion=False, bridge=True)
    s1 = ops_exotics.simulate_path_stats(
        p, S, T, key, bridge_up=True, bridge_log_b=float(np.log(HI / S)),
        **common)
    s2 = ops_exotics.simulate_path_stats(
        p, S, T, key, corridor=True, bridge_log_b=float(np.log(HI / S)),
        bridge_log_l=-5.0, **common)
    w1 = np.exp(np.asarray(s1["log_surv"]))
    w2 = np.exp(np.asarray(s2["log_surv"]))
    assert np.abs(w1 - w2).max() < 5e-4


# ─────────────────────────────────────────────────────────────────────────────
# Bridge MC vs oracle (GBM limit)
# ─────────────────────────────────────────────────────────────────────────────
def test_bridge_double_ko_exact_at_coarse_steps(gbm_engine):
    """Bridge monitoring removes the O(1/√n) discretization bias: at only
    32 steps the MC must sit on the continuous closed form."""
    res = gbm_engine.price_double_barrier(S, K, T, LO, HI, knock="out")
    exact = res["closed_form_gbm"]
    assert abs(res["price"] - exact) < max(4 * res["std_error"], 0.02)
    # while the raw discrete-grid estimator at the same steps is biased
    # high (paths that cross between grid points are missed)
    disc = gbm_engine.price_double_barrier(S, K, T, LO, HI, knock="out",
                                           monitoring="discrete")
    assert disc["price"] - exact > 6 * disc["std_error"]


def test_bridge_double_ki_and_parity(gbm_engine):
    ko = gbm_engine.price_double_barrier(S, K, T, LO, HI, knock="out")
    ki = gbm_engine.price_double_barrier(S, K, T, LO, HI, knock="in")
    vanilla = float(bs_price(S, K, T, R, Q, SIGMA, True))
    # per-path parity: raw KO + raw KI = raw vanilla estimate exactly
    total = ko["raw_mc_price"] + ki["raw_mc_price"]
    assert total == pytest.approx(vanilla, abs=0.15)  # MC noise only
    assert ki["price"] == pytest.approx(ki["closed_form_gbm"],
                                        abs=max(4 * ki["std_error"], 0.02))


def test_bridge_cv_reduces_variance():
    cv = ExoticEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=100_000,
                      num_steps=32, seed=7)
    raw = ExoticEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=100_000,
                       num_steps=32, seed=7, use_control_variate=False)
    a = cv.price_double_barrier(S, K, T, LO, HI)
    b = raw.price_double_barrier(S, K, T, LO, HI)
    assert a["std_error"] < 0.2 * b["std_error"]  # companion CV ≈ exact here
    assert abs(a["price"] - b["price"]) < 5 * b["std_error"]


def test_double_no_touch_and_complement(gbm_engine):
    dnt = gbm_engine.price_double_no_touch(S, T, LO, HI)
    assert abs(dnt["price"] - dnt["closed_form_gbm"]) < max(
        4 * dnt["std_error"], 0.005)
    dot = gbm_engine.price_double_no_touch(S, T, LO, HI, touch=True)
    df = np.exp(-R * T)
    # complementary digitals: prices sum to the discount factor
    assert dnt["price"] + dot["price"] == pytest.approx(df, abs=1e-4)
    assert 0.0 < dnt["stay_probability"] < 1.0
    # started through ⇒ decided at t=0
    through = gbm_engine.price_double_no_touch(S, T, 101.0, HI)
    assert through["price"] == 0.0
    through_t = gbm_engine.price_double_no_touch(S, T, 101.0, HI, touch=True)
    assert through_t["price"] == pytest.approx(df, abs=1e-9)


def test_double_barrier_under_full_svj():
    """Full SVJ: estimator stays coherent (parity, ordering) without a
    closed form to pin against."""
    p = SVJParams(kappa=2.0, theta=0.06, xi=0.5, rho=-0.6, v0=0.05,
                  lambda_j=0.3, mu_j=-0.05, sigma_j=0.1, r=R, q=Q)
    eng = ExoticEngine(p, num_paths=100_000, num_steps=32, seed=11)
    ko = eng.price_double_barrier(S, K, T, LO, HI, knock="out")
    ki = eng.price_double_barrier(S, K, T, LO, HI, knock="in")
    from mcos_tpu.engine.pricer import MonteCarloEngine

    euro = MonteCarloEngine(p, num_paths=200_000, num_steps=64,
                            seed=11).price(S, K, T)["price"]
    assert ko["raw_mc_price"] + ki["raw_mc_price"] == pytest.approx(
        euro, abs=max(6 * (ko["std_error"] + ki["std_error"]), 0.25))
    assert 0.0 < ko["price"] < euro


# ─────────────────────────────────────────────────────────────────────────────
# Pathwise AD Greeks
# ─────────────────────────────────────────────────────────────────────────────
def test_bridge_ad_double_barrier_greeks_match_oracle_fd(gbm_engine):
    """AD delta/vega of the smooth corridor weight vs f64 central FD of the
    corridor-density quadrature (GBM limit)."""
    g = gbm_engine.greeks(S, K, T, kind="double_barrier", barrier=HI,
                          barrier_lo=LO, knock="out", monitoring="bridge")
    h = 0.5
    fd_delta = (ops_exotics.double_barrier_bs(S + h, K, T, R, Q, SIGMA,
                                              LO, HI)
                - ops_exotics.double_barrier_bs(S - h, K, T, R, Q, SIGMA,
                                                LO, HI)) / (2 * h)
    hs = 0.01
    fd_dsig = (ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA + hs,
                                             LO, HI)
               - ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA - hs,
                                               LO, HI)) / (2 * hs)
    fd_vega_v0 = fd_dsig / (2.0 * SIGMA)    # dP/dv0 = dP/dσ · dσ/dv0
    assert g["delta"] == pytest.approx(fd_delta, abs=0.03)
    assert g["vega_v0"] == pytest.approx(fd_vega_v0, rel=0.10, abs=0.5)
    # double KO near the upper barrier: vega is NEGATIVE (vol kills it)
    assert g["vega_v0"] < 0.0


def test_bridge_ad_dnt_delta_sign(gbm_engine):
    """DNT with an asymmetric corridor: spot closer to the lower barrier ⇒
    moving up increases survival ⇒ positive delta."""
    g = gbm_engine.greeks(S, 0.0, T, kind="double_no_touch", barrier=140.0,
                          barrier_lo=90.0, knock="out", monitoring="bridge")
    fd = ops_exotics.double_no_touch_bs
    h = 0.5
    fd_delta = (fd(S + h, T, R, Q, SIGMA, 90.0, 140.0)
                - fd(S - h, T, R, Q, SIGMA, 90.0, 140.0)) / (2 * h)
    assert g["delta"] == pytest.approx(fd_delta, abs=5e-4)
    assert g["delta"] > 0.0


# ─────────────────────────────────────────────────────────────────────────────
# Sharded + API
# ─────────────────────────────────────────────────────────────────────────────
def test_sharded_double_barrier_matches_oracle():
    from jax.sharding import Mesh

    from mcos_tpu.parallel.mesh import sharded_exotic_price

    mesh = Mesh(np.array(jax.devices()), ("paths",))
    p = gbm_params(SIGMA, r=R, q=Q)
    exact = ops_exotics.double_barrier_bs(S, K, T, R, Q, SIGMA, LO, HI)
    res = sharded_exotic_price(
        p, S, K, T, jax.random.key(5), HI, mesh=mesh, kind="double_barrier",
        num_paths=160_000, num_steps=32, is_call=True, knock="out",
        monitoring="bridge",
        bridge_ctrl_exact=float(exact * np.exp(R * T)), barrier_lo=LO)
    price = float(res["price"])
    se = float(res["std_error"])
    assert abs(price - exact) < max(4 * se, 0.02)
    assert int(res["num_paths_used"]) >= 160_000


def test_api_double_barrier_kinds():
    from mcos_tpu.api.server import ApiError, handle_exotic

    body = {"spot": S, "T": T, "kind": "double_barrier", "strike": K,
            "barrier": HI, "barrier_lo": LO,
            "params": {"v0": SIGMA**2, "theta": SIGMA**2, "kappa": 1.0,
                       "xi": 1e-4, "rho": 0.0, "lambda_j": 0.0,
                       "mu_j": 0.0, "sigma_j": 1e-4, "r": R, "q": Q},
            "num_paths": 50_000, "with_greeks": True}
    out = handle_exotic(dict(body))
    assert out["monitoring"] == "bridge"
    assert abs(out["price"] - out["closed_form_gbm"]) < max(
        5 * out["std_error"], 0.05)
    assert out["greeks"]["method"] == "pathwise_ad_bridge"
    dnt = handle_exotic({**body, "kind": "double_no_touch",
                         "with_greeks": False})
    dot = handle_exotic({**body, "kind": "double_one_touch",
                         "with_greeks": False})
    assert dnt["price"] + dot["price"] == pytest.approx(
        np.exp(-R * T), abs=1e-3)
    with pytest.raises(ApiError):
        handle_exotic({**body, "barrier_lo": None})
    with pytest.raises(ApiError):
        handle_exotic({**body, "barrier_lo": 130.0})  # lo ≥ hi
