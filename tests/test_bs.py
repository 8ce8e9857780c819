"""Black-Scholes analytics: values vs scipy reference, AD-consistency of Greeks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from mcos_tpu.ops import bs


def scipy_bs_price(S, K, T, r, q, sigma, is_call=True):
    d1 = (np.log(S / K) + (r - q + 0.5 * sigma**2) * T) / (sigma * np.sqrt(T))
    d2 = d1 - sigma * np.sqrt(T)
    if is_call:
        return S * np.exp(-q * T) * norm.cdf(d1) - K * np.exp(-r * T) * norm.cdf(d2)
    return K * np.exp(-r * T) * norm.cdf(-d2) - S * np.exp(-q * T) * norm.cdf(-d1)


CASES = [
    (22500.0, 22500.0, 0.04, 0.065, 0.012, 0.20),
    (22500.0, 21000.0, 0.25, 0.065, 0.012, 0.15),
    (100.0, 120.0, 1.00, 0.03, 0.00, 0.35),
    (100.0, 80.0, 2.00, 0.05, 0.02, 0.10),
]


@pytest.mark.parametrize("S,K,T,r,q,sigma", CASES)
@pytest.mark.parametrize("is_call", [True, False])
def test_price_matches_scipy(S, K, T, r, q, sigma, is_call):
    ours = float(bs.bs_price(S, K, T, r, q, sigma, is_call))
    ref = scipy_bs_price(S, K, T, r, q, sigma, is_call)
    # fp32 pricing path: ~1e-4 relative is the expected precision envelope.
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-4)


@pytest.mark.parametrize("is_call", [True, False])
def test_put_call_parity(is_call):
    S, K, T, r, q, sigma = 100.0, 105.0, 0.5, 0.05, 0.01, 0.25
    c = float(bs.bs_price(S, K, T, r, q, sigma, True))
    p = float(bs.bs_price(S, K, T, r, q, sigma, False))
    parity = S * np.exp(-q * T) - K * np.exp(-r * T)
    assert c - p == pytest.approx(parity, abs=1e-3)


@pytest.mark.parametrize("S,K,T,r,q,sigma", CASES)
def test_closed_form_greeks_match_ad(S, K, T, r, q, sigma):
    """Closed-form Greeks must equal jax.grad of the price."""
    f = lambda S_, sig_, r_, T_: bs.bs_price(S_, K, T_, r_, q, sig_, True)
    dS, dsig, dr, dT = [
        float(jax.grad(f, argnums=i)(S, sigma, r, T)) for i in range(4)
    ]
    assert dS == pytest.approx(float(bs.bs_delta(S, K, T, r, q, sigma, True)), rel=1e-3)
    assert dsig == pytest.approx(float(bs.bs_vega(S, K, T, r, q, sigma)), rel=1e-3)
    assert dr == pytest.approx(float(bs.bs_rho(S, K, T, r, q, sigma, True)), rel=1e-3)
    # theta = -dP/dT
    assert -dT == pytest.approx(float(bs.bs_theta(S, K, T, r, q, sigma, True)), rel=1e-3)


def test_gamma_is_delta_slope():
    S, K, T, r, q, sigma = 100.0, 100.0, 0.5, 0.05, 0.01, 0.25
    ad_gamma = float(jax.grad(jax.grad(
        lambda s: bs.bs_price(s, K, T, r, q, sigma, True)))(S))
    assert ad_gamma == pytest.approx(float(bs.bs_gamma(S, K, T, r, q, sigma)), rel=1e-2)


def test_degenerate_limits_and_grad_safety():
    # T=0 → intrinsic, and gradients must not be NaN.
    assert float(bs.bs_price(110.0, 100.0, 0.0, 0.05, 0.0, 0.2, True)) == pytest.approx(10.0)
    assert float(bs.bs_price(90.0, 100.0, 0.0, 0.05, 0.0, 0.2, True)) == 0.0
    g = jax.grad(lambda s: bs.bs_price(s, 100.0, 0.0, 0.05, 0.0, 0.2, True))(110.0)
    assert np.isfinite(float(g))
    # σ=0 → discounted intrinsic forward value
    v = float(bs.bs_price(100.0, 90.0, 1.0, 0.05, 0.0, 0.0, True))
    assert v == pytest.approx(100.0 - 90.0 * np.exp(-0.05), rel=1e-5)


def test_vectorized_over_strikes():
    ks = jnp.linspace(80.0, 120.0, 21)
    prices = bs.bs_price(100.0, ks, 0.5, 0.05, 0.01, 0.2, True)
    assert prices.shape == (21,)
    assert bool(jnp.all(jnp.diff(prices) < 0))  # call price decreasing in K


def test_zero_vol_delta_uses_forward_moneyness():
    """σ→0 with time left: delta → e^{-qT}·1{forward ITM}, not the spot
    comparison (review finding: price/delta were inconsistent in the limit)."""
    S, K, T, r, q = 100.0, 100.5, 1.0, 0.065, 0.012
    # Forward = 100·e^{0.053} ≈ 105.4 > K ⇒ call delta ≈ e^{-qT}.
    d = float(bs.bs_delta(S, K, T, r, q, 0.0, True))
    assert d == pytest.approx(np.exp(-q * T), abs=1e-6)
    assert float(bs.bs_delta(S, K, T, r, q, 0.0, False)) == pytest.approx(0.0)
    # At expiry the spot comparison rules.
    assert float(bs.bs_delta(99.0, 100.0, 0.0, r, q, 0.2, True)) == 0.0
    # Consistency with jax.grad of the degenerate price on the live side.
    eps_sigma = 1e-3
    import jax
    g = float(jax.grad(lambda s: bs.bs_price(s, K, T, r, q, eps_sigma, True))(S))
    assert d == pytest.approx(g, abs=5e-3)
