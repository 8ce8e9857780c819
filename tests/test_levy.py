"""Variance Gamma: exact-sampler MC vs the COS oracle, martingale, BS
limit, and the pure-jump skew signature."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcos_tpu.ops.bs import bs_price
from mcos_tpu.ops.levy import (VGParams, vg_cf, vg_cos_price, vg_price_mc,
                               vg_terminal)

P = VGParams(sigma=0.2, nu=0.2, theta=-0.14, r=0.05, q=0.01)
S, T = 100.0, 0.5


def test_mc_matches_cos_across_strikes():
    # Two independent routes to the same law: exact sampler vs COS.
    ks = [85.0, 95.0, 100.0, 105.0, 115.0]
    cos = vg_cos_price(P, S, ks, T, True)
    mc, se = vg_price_mc(P, S, jnp.asarray(ks), T, jax.random.key(1),
                         num_paths=500_000, is_call=True)
    sig = np.abs(np.asarray(mc) - cos) / np.asarray(se)
    assert np.all(sig < 4.0), sig


def test_terminal_martingale():
    st = vg_terminal(P, S, T, jax.random.key(2), num_paths=1_000_000)
    se = float(st.std()) / np.sqrt(st.size / 2)
    assert abs(float(st.mean()) - S * np.exp((P.r - P.q) * T)) < 4 * se


def test_nu_to_zero_is_black_scholes():
    p0 = VGParams(sigma=0.2, nu=1e-4, theta=0.0, r=0.05, q=0.01)
    cos = vg_cos_price(p0, S, [90.0, 100.0, 110.0], T, True)
    for px, k in zip(cos, [90.0, 100.0, 110.0]):
        ref = float(bs_price(S, k, T, 0.05, 0.01, 0.2, True))
        assert px == pytest.approx(ref, rel=5e-4)


def test_cf_at_zero_and_symmetry():
    assert vg_cf(np.array([0.0]), P, T, S)[0] == pytest.approx(1.0)
    # phi(-u) = conj(phi(u)) for a real-valued log-spot density
    u = np.array([0.7, 1.3, 5.0])
    np.testing.assert_allclose(vg_cf(-u, P, T, S),
                               np.conj(vg_cf(u, P, T, S)), rtol=1e-12)


def test_negative_theta_prices_left_tail():
    # Pure-jump VG with theta < 0: the OTM put trades well above a BS put
    # at the same TOTAL variance — the left tail is where VG lives.
    put_vg = vg_cos_price(P, S, [85.0], T, False)[0]
    total_sd = np.sqrt(P.sigma**2 + P.nu * P.theta**2)
    put_bs = float(bs_price(S, 85.0, T, 0.05, 0.01, total_sd, False))
    assert put_vg > 1.15 * put_bs


def test_put_call_parity():
    c = vg_cos_price(P, S, [100.0], T, True)[0]
    p = vg_cos_price(P, S, [100.0], T, False)[0]
    rhs = S * np.exp(-P.q * T) - 100.0 * np.exp(-P.r * T)
    assert c - p == pytest.approx(rhs, abs=1e-8)


def test_calibration_recovers_vg_parameters():
    from mcos_tpu.ops.levy import calibrate_vg
    true = VGParams(sigma=0.18, nu=0.35, theta=-0.22, r=0.05, q=0.01)
    ks = S * np.linspace(0.85, 1.15, 11)
    mkt = vg_cos_price(true, S, ks, T, True)
    fit = calibrate_vg(S, ks, T, mkt, r=0.05, q=0.01)
    assert fit["sigma"] == pytest.approx(0.18, abs=1e-4)
    assert fit["nu"] == pytest.approx(0.35, abs=1e-3)
    assert fit["theta"] == pytest.approx(-0.22, abs=1e-3)
    assert fit["rmse_price"] < 1e-8


# ─────────────────────────────────────────────────────────────────────────────
# NIG (inverse-Gaussian clock)
# ─────────────────────────────────────────────────────────────────────────────
def test_nig_mc_matches_cos():
    from mcos_tpu.ops.levy import NIGParams, nig_cos_price, nig_terminal
    p = NIGParams(sigma=0.2, nu=0.2, theta=-0.14, r=0.05, q=0.01)
    st = nig_terminal(p, S, T, jax.random.key(1), num_paths=500_000)
    ks = [85.0, 100.0, 115.0]
    pay = jnp.maximum(st[..., None] - jnp.asarray(ks), 0.0).mean(axis=0)
    disc = np.exp(-p.r * T)
    mc = disc * np.asarray(pay.mean(axis=0))
    se = disc * np.asarray(pay.std(axis=0)) / np.sqrt(pay.shape[0])
    cos = nig_cos_price(p, S, ks, T, True)
    assert np.all(np.abs(mc - cos) / se < 4.0)


def test_nig_martingale_and_bs_limit():
    from mcos_tpu.ops.levy import NIGParams, nig_cos_price, nig_terminal
    p = NIGParams(sigma=0.2, nu=0.2, theta=-0.14, r=0.05, q=0.01)
    st = nig_terminal(p, S, T, jax.random.key(2), num_paths=1_000_000)
    se = float(st.std()) / np.sqrt(st.size / 2)
    assert abs(float(st.mean()) - S * np.exp((p.r - p.q) * T)) < 4 * se
    p0 = NIGParams(sigma=0.2, nu=1e-5, theta=0.0, r=0.05, q=0.01)
    ref = float(bs_price(S, 100.0, T, 0.05, 0.01, 0.2, True))
    assert nig_cos_price(p0, S, [100.0], T, True)[0] == pytest.approx(
        ref, rel=2e-4)


def test_nig_tails_lighter_than_vg_at_same_moments():
    # Same (sigma, nu, theta): NIG's semi-heavy tails price the deep OTM
    # put BELOW VG's heavier polynomial-corrected exponential tails.
    from mcos_tpu.ops.levy import NIGParams, nig_cos_price
    pv = VGParams(sigma=0.2, nu=0.6, theta=-0.14, r=0.05, q=0.01)
    pn = NIGParams(sigma=0.2, nu=0.6, theta=-0.14, r=0.05, q=0.01)
    vg = vg_cos_price(pv, S, [70.0], T, False)[0]
    nig = nig_cos_price(pn, S, [70.0], T, False)[0]
    assert vg != pytest.approx(nig, rel=1e-3)   # genuinely different laws


def test_calibration_recovers_nig_parameters():
    from mcos_tpu.ops.levy import NIGParams, calibrate_nig, nig_cos_price
    true = NIGParams(sigma=0.17, nu=0.3, theta=-0.2, r=0.05, q=0.01)
    ks = S * np.linspace(0.85, 1.15, 11)
    mkt = nig_cos_price(true, S, ks, T, True)
    fit = calibrate_nig(S, ks, T, mkt, r=0.05, q=0.01)
    assert fit["sigma"] == pytest.approx(0.17, abs=1e-3)
    assert fit["nu"] == pytest.approx(0.3, abs=5e-3)
    assert fit["theta"] == pytest.approx(-0.2, abs=5e-3)
    assert fit["rmse_price"] < 1e-7
