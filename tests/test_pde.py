"""Crank-Nicolson PDE engine vs closed forms, CRR, and the local-vol MC.

The point of the PDE engine is *independence*: a finite-difference price
agreeing with the MC price is two different discretizations of the same
model agreeing — the strongest internal consistency check the framework
has (shared-kernel MC comparisons can share bugs)."""

import numpy as np
import pytest

from mcos_tpu.engine.american import binomial_american_bs
from mcos_tpu.engine.localvol import LocalVolEngine, LocalVolSurface
from mcos_tpu.engine.pde import PDEEngine
from mcos_tpu.ops.bs import bs_delta, bs_gamma, bs_price

S, K, T, R, Q, SIG = 100.0, 105.0, 0.5, 0.06, 0.02, 0.25


@pytest.fixture(scope="module")
def bs_engine():
    return PDEEngine(sigma=SIG, r=R, q=Q)


@pytest.mark.parametrize("is_call", [True, False])
def test_european_matches_black_scholes(bs_engine, is_call):
    res = bs_engine.price(S, K, T, is_call=is_call)
    ref = float(bs_price(S, K, T, R, Q, SIG, is_call))
    assert res["price"] == pytest.approx(ref, rel=2e-4)


def test_grid_greeks_match_closed_forms(bs_engine):
    res = bs_engine.price(S, K, T, is_call=True)
    assert res["delta"] == pytest.approx(
        float(bs_delta(S, K, T, R, Q, SIG, True)), abs=2e-4)
    assert res["gamma"] == pytest.approx(
        float(bs_gamma(S, K, T, R, Q, SIG)), rel=2e-3)


def test_american_put_matches_crr(bs_engine):
    res = bs_engine.price(S, 115.0, T, is_call=False, american=True)
    crr = binomial_american_bs(S, 115.0, T, R, Q, SIG, steps=2000,
                               is_call=False)
    assert res["price"] == pytest.approx(crr, rel=5e-4)
    assert res["method"] == "crank-nicolson-projected"


def test_american_exceeds_european_put(bs_engine):
    am = bs_engine.price(S, K, T, is_call=False, american=True)["price"]
    eu = bs_engine.price(S, K, T, is_call=False)["price"]
    assert am > eu


def test_flat_localvol_surface_reproduces_bs():
    surf = LocalVolSurface.flat(0.2, r=0.065, q=0.012)
    res = PDEEngine(localvol=surf).price(22500.0, 22500.0, 0.5)
    ref = float(bs_price(22500.0, 22500.0, 0.5, 0.065, 0.012, 0.2, True))
    assert res["price"] == pytest.approx(ref, rel=5e-4)


def test_pde_cross_validates_localvol_mc():
    """Skewed Dupire surface: the PDE and the MC engine are independent
    discretizations of the same model — they must agree within MC bars."""
    from mcos_tpu.engine.ssvi import SSVISurface

    mats = np.array([0.25, 0.5, 1.0])
    ssvi = SSVISurface(mats, 0.04 * mats, rho=-0.7, eta=1.2, gamma=0.4)
    lv = LocalVolSurface.from_ssvi(ssvi, 22500.0, r=0.065, q=0.012)
    pde = PDEEngine(localvol=lv).price(22500.0, 21500.0, 0.5,
                                       is_call=False)
    mc = LocalVolEngine(lv, num_paths=200_000, num_steps=128, seed=2).price(
        22500.0, 21500.0, 0.5, is_call=False)
    assert abs(pde["price"] - mc["price"]) < 4 * mc["std_error"] + 1.0


def test_rannacher_damps_atm_kink():
    # Gamma at the strike is the CN-oscillation hotspot; with Rannacher
    # start-up it must match the smooth closed form tightly.
    eng = PDEEngine(sigma=SIG, r=R, q=Q, n_t=128)
    res = eng.price(105.0, 105.0, 0.1, is_call=True)
    assert res["gamma"] == pytest.approx(
        float(bs_gamma(105.0, 105.0, 0.1, R, Q, SIG)), rel=5e-3)


# ─────────────────────────────────────────────────────────────────────────────
# Discrete proportional dividends
# ─────────────────────────────────────────────────────────────────────────────
def test_discrete_dividends_match_adjusted_spot_bs():
    # Proportional dividends under flat vol: European price = BS at
    # S0 * prod(1 - d_i) — exact.
    eng = PDEEngine(sigma=SIG, r=R, q=0.0)
    divs = [(0.15, 0.02), (0.35, 0.03)]
    res = eng.price(S, K, T, is_call=True, dividends=divs)
    ref = float(bs_price(S * 0.98 * 0.97, K, T, R, 0.0, SIG, True))
    # 5e-4 relative: the ex-date jump interpolation adds O(dx²) on top of
    # the scheme's 2e-4 — still <2bp of price.
    assert res["price"] == pytest.approx(ref, rel=5e-4)


def test_dividend_outside_life_is_noop():
    eng = PDEEngine(sigma=SIG, r=R, q=0.0)
    a = eng.price(S, K, T, dividends=[(T + 0.1, 0.05)])
    b = eng.price(S, K, T)
    assert a["price"] == pytest.approx(b["price"], abs=1e-9)


def test_american_call_exercises_before_big_dividend():
    # With a large ex-div drop, the American call is worth strictly more
    # than the European (exercise just before the ex-date captures the
    # dividend) — the classic discrete-div effect a continuous q misses.
    eng = PDEEngine(sigma=SIG, r=R, q=0.0)
    am = eng.price(S, 95.0, T, is_call=True, american=True,
                   dividends=[(0.25, 0.06)])
    eu = eng.price(S, 95.0, T, is_call=True, dividends=[(0.25, 0.06)])
    assert am["price"] > eu["price"] + 0.1


def test_invalid_dividend_fraction_rejected():
    eng = PDEEngine(sigma=SIG, r=R, q=0.0)
    with pytest.raises(ValueError):
        eng.price(S, K, T, dividends=[(0.25, 1.5)])


def test_american_put_under_flat_localvol_matches_crr():
    # Dupire-coefficient path + projection: flat surface must reproduce
    # the constant-vol CRR American value.
    surf = LocalVolSurface.flat(SIG, r=R, q=0.0)
    eng = PDEEngine(localvol=surf)
    res = eng.price(S, 115.0, T, is_call=False, american=True)
    crr = binomial_american_bs(S, 115.0, T, R, 0.0, SIG, steps=2000,
                               is_call=False)
    assert res["price"] == pytest.approx(crr, rel=1e-3)


# ── Early-exercise boundary ──────────────────────────────────────────────────
def test_put_boundary_shape():
    """BS American put (r > q): S*(t) sits below the strike, increases
    toward it as expiry approaches, and the same solve reprices the
    option."""
    from mcos_tpu.engine.pde import PDEEngine

    K = 1000.0
    eng = PDEEngine(sigma=0.2, r=0.065, q=0.012, n_x=401, n_t=256)
    bd = eng.exercise_boundary(1000.0, K, 1.0, is_call=False)
    s = np.asarray(bd["s_star"], np.float64)
    t = np.asarray(bd["t"], np.float64)
    assert np.all(np.diff(t) > 0)
    finite = np.isfinite(s)
    assert finite.mean() > 0.9            # put: exercise region exists
    assert np.nanmax(s) < K               # boundary strictly below strike
    # → K as t → T (r > q) — logarithmically slowly; the near-expiry
    # boundary clears 93% of the strike on this grid
    assert np.nanmax(s) > 0.93 * K
    assert np.nanmax(s) == pytest.approx(np.nanmax(s[-25:]))  # peak at T−
    # monotone increasing in calendar time up to one grid cell of noise
    ds = np.diff(s[finite])
    dx_cell = 1000.0 * 0.03               # ~grid spacing near the strike
    assert (ds > -dx_cell).all()
    # price consistency with the pricing entry point
    ref = eng.price(1000.0, K, 1.0, is_call=False, american=True)["price"]
    assert bd["price"] == pytest.approx(ref, rel=1e-6)


def test_call_boundary_only_with_dividends():
    """q=0 American call: never exercised early → boundary all NaN;
    with a large carry (q > r) a finite boundary appears above K."""
    from mcos_tpu.engine.pde import PDEEngine

    K = 1000.0
    none = PDEEngine(sigma=0.2, r=0.05, q=0.0, n_t=128).exercise_boundary(
        1000.0, K, 1.0, is_call=True)
    assert np.all(~np.isfinite(np.asarray(none["s_star"])))

    some = PDEEngine(sigma=0.2, r=0.03, q=0.08, n_t=128).exercise_boundary(
        1000.0, K, 1.0, is_call=True)
    s = np.asarray(some["s_star"], np.float64)
    assert np.isfinite(s).any()
    assert np.nanmin(s) > K               # calls exercise above the strike
