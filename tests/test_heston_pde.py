"""2-D ADI Heston PDE engine vs the COS oracle / BS / LSM.

The third independent numerical route to the flagship model (MC, COS, now
a deterministic (x, v) finite-difference grid); three methods agreeing is
the strongest internal consistency argument the framework can make.
"""

import numpy as np
import pytest

from mcos_tpu.engine.pde import HestonPDEEngine
from mcos_tpu.models.params import SVJParams
from mcos_tpu.ops.bs import bs_price
from mcos_tpu.ops.cos_pricer import heston_price

HESTON = SVJParams(kappa=3.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04,
                   lambda_j=0.0)


def test_adi_matches_cos_european():
    eng = HestonPDEEngine(HESTON)
    for K, T, is_call in [(100.0, 0.5, True), (110.0, 0.5, True),
                          (90.0, 0.25, True), (100.0, 1.0, True),
                          (100.0, 0.5, False), (95.0, 0.5, False)]:
        got = eng.price(100.0, K, T, is_call=is_call)["price"]
        exact = float(heston_price(HESTON, 100.0, [K], T, is_call)[0])
        assert got == pytest.approx(exact, abs=0.015), (K, T, is_call)


def test_adi_feller_violating_regime():
    """kappa=1, theta=0.09, xi=1 (2*kappa*theta < xi^2): the v=0 edge is
    attainable; the degenerate-PDE edge row must keep the solve accurate."""
    p = SVJParams(kappa=1.0, theta=0.09, xi=1.0, rho=-0.5, v0=0.09,
                  lambda_j=0.0)
    eng = HestonPDEEngine(p)
    for K, T in [(100.0, 0.5), (120.0, 0.5), (100.0, 0.1)]:
        got = eng.price(100.0, K, T, is_call=True)["price"]
        exact = float(heston_price(p, 100.0, [K], T, True)[0])
        assert got == pytest.approx(exact, abs=0.03), (K, T)


def test_adi_degenerate_bs():
    """xi -> 0, v0 = theta freezes the variance: the 2-D solve must
    reproduce closed-form Black-Scholes."""
    p = SVJParams(kappa=3.0, theta=0.04, xi=1e-4, rho=0.0, v0=0.04,
                  lambda_j=0.0)
    eng = HestonPDEEngine(p)
    got = eng.price(100.0, 100.0, 0.5, is_call=True)["price"]
    exact = float(bs_price(100.0, 100.0, 0.5, p.r, p.q, 0.2, True))
    assert got == pytest.approx(exact, abs=0.01)


def test_adi_put_call_parity():
    eng = HestonPDEEngine(HESTON)
    c = eng.price(100.0, 100.0, 0.5, is_call=True)["price"]
    p = eng.price(100.0, 100.0, 0.5, is_call=False)["price"]
    par = 100.0 * np.exp(-HESTON.q * 0.5) - 100.0 * np.exp(-HESTON.r * 0.5)
    assert c - p == pytest.approx(par, abs=0.01)


def test_adi_delta_gamma_match_cos_fd():
    eng = HestonPDEEngine(HESTON)
    res = eng.price(100.0, 100.0, 0.5, is_call=True)
    h = 0.5
    pu = float(heston_price(HESTON, 100.0 + h, [100.0], 0.5, True)[0])
    pd = float(heston_price(HESTON, 100.0 - h, [100.0], 0.5, True)[0])
    p0 = float(heston_price(HESTON, 100.0, [100.0], 0.5, True)[0])
    assert res["delta"] == pytest.approx((pu - pd) / (2 * h), abs=2e-3)
    assert res["gamma"] == pytest.approx((pu - 2 * p0 + pd) / h**2,
                                         rel=0.05)


def test_adi_douglas_close_to_cs():
    cs = HestonPDEEngine(HESTON).price(100.0, 100.0, 0.5)["price"]
    dg = HestonPDEEngine(HESTON, scheme="douglas").price(
        100.0, 100.0, 0.5)["price"]
    assert dg == pytest.approx(cs, abs=0.02)


def test_adi_american_put_bracket():
    """American ADI put: above the European COS price, above intrinsic,
    and within MC noise of the independent LSM estimate."""
    from mcos_tpu.engine.american import AmericanEngine

    eng = HestonPDEEngine(HESTON)
    am = eng.price(90.0, 100.0, 0.5, is_call=False, american=True)["price"]
    eu = float(heston_price(HESTON, 90.0, [100.0], 0.5, False)[0])
    assert am > eu
    assert am >= 10.0  # intrinsic
    lsm = AmericanEngine(HESTON, num_paths=100_000, num_steps=64,
                         seed=3).price(90.0, 100.0, 0.5, is_call=False)
    # LSM is a (slightly low-biased) MC estimate; the PDE is deterministic.
    assert abs(am - lsm["price"]) < 5 * lsm["std_error"] + 0.05 * am


def test_adi_rejects_jumps():
    with pytest.raises(ValueError, match="lambda_j"):
        HestonPDEEngine(SVJParams(lambda_j=1.0))
    with pytest.raises(ValueError, match="scheme"):
        HestonPDEEngine(HESTON, scheme="euler")


def test_api_pde_endpoint_modes():
    from mcos_tpu.api.server import handle_pde

    # Heston 2-D American with a COS European oracle cross-check.
    eur = handle_pde({"spot": 100.0, "strike": 100.0, "T": 0.5,
                      "with_oracle": True, "params": {"lambda_j": 0.0}})
    assert eur["cos_oracle"]["abs_error"] < 0.02
    am = handle_pde({"spot": 90.0, "strike": 100.0, "T": 0.5,
                     "is_call": False, "american": True,
                     "params": {"lambda_j": 0.0}})
    assert am["price"] >= 10.0  # intrinsic floor via projection
    # BS 1-D with the exercise boundary.
    bs = handle_pde({"spot": 90.0, "strike": 100.0, "T": 0.5,
                     "is_call": False, "model": "bs", "american": True,
                     "with_boundary": True})
    assert len(bs["exercise_boundary"]["t"]) == bs["n_t"]
    # Jumps rejected with a schema error.
    with pytest.raises(Exception, match="no jump term"):
        handle_pde({"spot": 100.0, "strike": 100.0, "T": 0.5,
                    "params": {"lambda_j": 1.0}})


def test_adi_vega_matches_cos_fd():
    """The grid's v-axis gradient is dP/dv0; pin it against a central FD
    of the COS oracle in v0 (conventions match engine/greeks.py)."""
    eng = HestonPDEEngine(HESTON)
    res = eng.price(100.0, 100.0, 0.5, is_call=True)
    h = 0.004
    pu = float(heston_price(HESTON.replace(v0=0.04 + h), 100.0, [100.0],
                            0.5, True)[0])
    pd = float(heston_price(HESTON.replace(v0=0.04 - h), 100.0, [100.0],
                            0.5, True)[0])
    fd = (pu - pd) / (2 * h)
    assert res["ad_vega_v0"] == pytest.approx(fd, rel=0.03)
    assert res["vega_per_vol_point"] == pytest.approx(fd * 2 * 0.2,
                                                     rel=0.03)
