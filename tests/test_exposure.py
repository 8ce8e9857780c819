"""Exposure/CVA engine: martingale-EE, forward-Black, and netting oracles.

The closed-form oracles (module header of engine/exposure.py):
  * long call: e^{-rt} EE(t) = C_0 (discounted martingale, V_t >= 0),
    hence CVA = LGD * C_0 * PD(horizon);
  * forward: EE(t) = discounted Black on the t-forward value;
  * netting: netted EE <= gross EE, pathwise.
"""

import numpy as np
import pytest
from scipy.stats import norm

from mcos_tpu.engine.exposure import ExposureEngine
from mcos_tpu.ops.bs import bs_price

S, SIG, R, Q, T = 100.0, 0.25, 0.05, 0.0, 1.0
CALL = {"kind": "call", "strike": 100.0, "T": T, "qty": 1.0}


def _engine(positions, num_paths=100_000, seed=1, **kw):
    return ExposureEngine([S], [SIG], [[1.0]], positions, r=R, q=[Q],
                          num_paths=num_paths, seed=seed, **kw)


def test_call_ee_is_martingale_constant():
    c0 = float(bs_price(S, 100.0, T, R, Q, SIG, True))
    prof = _engine([CALL]).profile(num_dates=8, horizon=0.96)
    disc_ee = np.exp(-R * np.asarray(prof["dates"])) * np.asarray(prof["ee"])
    np.testing.assert_allclose(disc_ee, c0, rtol=0.01)
    # ENE = 0: a long option is never a liability.
    assert max(prof["ene"]) == 0.0


def test_call_cva_closed_form():
    c0 = float(bs_price(S, 100.0, T, R, Q, SIG, True))
    h, lgd, hor = 0.03, 0.6, 0.999 * T
    cva = _engine([CALL], num_paths=200_000).cva(
        hazard_rate=h, lgd=lgd, num_dates=16, horizon=hor)
    oracle = lgd * c0 * (1.0 - np.exp(-h * hor))
    assert cva["cva"] == pytest.approx(oracle, rel=0.01)


def test_forward_ee_matches_black():
    fwd = {"kind": "forward", "strike": 100.0, "T": T, "qty": 1.0}
    prof = _engine([fwd], num_paths=200_000, seed=2).profile(
        num_dates=4, horizon=0.8)
    t = np.asarray(prof["dates"])
    tau = T - t
    f_mean = S * np.exp((R - Q) * T)
    s_ = SIG * np.sqrt(t)
    d1 = (np.log(f_mean / 100.0) + 0.5 * s_**2) / s_
    d2 = d1 - s_
    oracle = np.exp(-R * tau) * (f_mean * norm.cdf(d1)
                                 - 100.0 * norm.cdf(d2))
    np.testing.assert_allclose(np.asarray(prof["ee"]), oracle, rtol=0.02)


def test_netting_benefit_nonnegative_and_real():
    book = [{"kind": "call", "strike": 100.0, "T": T, "qty": 1.0},
            {"kind": "call", "strike": 110.0, "T": T, "qty": -1.0}]
    prof = _engine(book, num_paths=50_000, seed=3).profile(
        num_dates=4, horizon=0.8)
    assert all(g >= e - 1e-6
               for g, e in zip(prof["gross_ee"], prof["ee"]))
    assert prof["netting_benefit"] > 1.0   # call spread nets hard


def test_pfe_dominates_ee_and_grows():
    prof = _engine([CALL], num_paths=50_000).profile(
        num_dates=6, horizon=0.9, quantile=0.975)
    pfe, ee = np.asarray(prof["pfe"]), np.asarray(prof["ee"])
    assert np.all(pfe >= ee)
    assert pfe[-1] > pfe[0]                # diffusive exposure widens


def test_expired_positions_drop_out():
    short_opt = {"kind": "call", "strike": 100.0, "T": 0.25, "qty": 1.0}
    prof = _engine([short_opt]).profile(num_dates=8, horizon=1.0)
    ee = np.asarray(prof["ee"])
    assert ee[0] > 0.0
    np.testing.assert_allclose(ee[2:], 0.0)   # dates past T=0.25


def test_cva_delta_matches_crn_fd():
    d = _engine([CALL], num_paths=100_000).cva_delta(
        hazard_rate=0.03, lgd=0.6, num_dates=8)
    h = 0.5
    up = ExposureEngine([S + h], [SIG], [[1.0]], [CALL], r=R, q=[Q],
                        num_paths=100_000, seed=1)
    dn = ExposureEngine([S - h], [SIG], [[1.0]], [CALL], r=R, q=[Q],
                        num_paths=100_000, seed=1)
    fd = (up.cva_delta(0.03, 0.6, 8)["cva"]
          - dn.cva_delta(0.03, 0.6, 8)["cva"]) / (2 * h)
    assert d["cva_delta"][0] == pytest.approx(fd, abs=1e-4)


def test_bcva_and_multi_asset():
    spots = [100.0, 50.0]
    sigmas = [0.25, 0.35]
    corr = [[1.0, 0.5], [0.5, 1.0]]
    book = [{"kind": "call", "strike": 100.0, "T": 1.0, "qty": 1.0,
             "asset": 0},
            {"kind": "put", "strike": 50.0, "T": 0.5, "qty": -2.0,
             "asset": 1}]
    eng = ExposureEngine(spots, sigmas, corr, book, r=R, num_paths=30_000)
    out = eng.cva(hazard_rate=0.02, lgd=0.6, own_hazard=0.01)
    assert out["cva"] > 0 and out["dva"] > 0
    assert out["bcva"] == pytest.approx(out["cva"] - out["dva"])


def test_collateral_threshold_limits():
    eng = _engine([CALL], num_paths=50_000)
    un = eng.profile(num_dates=16)
    inf_thr = eng.profile(num_dates=16, collateral_threshold=1e12)
    zero_thr = eng.profile(num_dates=16, collateral_threshold=0.0)
    mid_thr = eng.profile(num_dates=16, collateral_threshold=5.0)
    # threshold -> inf recovers the uncollateralized profile exactly
    np.testing.assert_allclose(inf_thr["ee"], un["ee"], rtol=1e-6)
    # monotone in the threshold; full collateralization leaves only the
    # margin-period gap risk
    assert zero_thr["epe"] < mid_thr["epe"] < un["epe"]
    assert zero_thr["epe"] < 0.25 * un["epe"]
    # before the first margin call (t <= MPR) nothing is held yet
    assert zero_thr["ee"][0] == pytest.approx(un["ee"][0], rel=1e-6)


def test_wrong_way_risk_cva():
    """gamma = 0 reduces exactly to the independent-hazard CVA; positive
    gamma lowers a long-call book's CVA (right-way: exposure grows with
    the market, default clusters against it) and raises a long-put
    book's (wrong-way: both grow as the market falls)."""
    call_eng = _engine([CALL], num_paths=100_000)
    base = call_eng.cva(hazard_rate=0.03, lgd=0.6, num_dates=16)
    w0 = call_eng.cva_wwr(hazard_rate=0.03, lgd=0.6, gamma=0.0,
                          num_dates=16)
    assert w0["cva"] == pytest.approx(base["cva"], rel=1e-5)

    w2 = call_eng.cva_wwr(hazard_rate=0.03, lgd=0.6, gamma=2.0,
                          num_dates=16)
    assert w2["cva"] < 0.9 * w0["cva"]          # right-way relief

    put_eng = _engine([{"kind": "put", "strike": 100.0, "T": T}],
                      num_paths=100_000)
    p0 = put_eng.cva_wwr(hazard_rate=0.03, lgd=0.6, gamma=0.0,
                         num_dates=16)
    p2 = put_eng.cva_wwr(hazard_rate=0.03, lgd=0.6, gamma=2.0,
                         num_dates=16)
    assert p2["cva"] > 1.2 * p0["cva"]          # wrong-way penalty
    assert 0.0 < p2["mean_pd_horizon"] < 0.2
