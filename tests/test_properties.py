"""Property-based tests (hypothesis): no-arbitrage bounds and consistency
relations that must hold for EVERY parameterization, not just fixtures."""

import numpy as np
from hypothesis import given, settings, strategies as st

from mcos_tpu.ops import bs

spots = st.floats(10.0, 50_000.0)
moneyness = st.floats(0.5, 2.0)
maturities = st.floats(0.01, 3.0)
rates = st.floats(0.0, 0.15)
vols = st.floats(0.05, 1.5)


@settings(max_examples=60, deadline=None)
@given(spots, moneyness, maturities, rates, rates, vols)
def test_call_price_bounds(S, m, T, r, q, sigma):
    K = S * m
    c = float(bs.bs_price(S, K, T, r, q, sigma, True))
    lower = max(S * np.exp(-q * T) - K * np.exp(-r * T), 0.0)
    assert lower - 1e-2 <= c <= S * np.exp(-q * T) + 1e-2


@settings(max_examples=60, deadline=None)
@given(spots, moneyness, maturities, rates, rates, vols)
def test_put_call_parity_everywhere(S, m, T, r, q, sigma):
    K = S * m
    c = float(bs.bs_price(S, K, T, r, q, sigma, True))
    p = float(bs.bs_price(S, K, T, r, q, sigma, False))
    parity = S * np.exp(-q * T) - K * np.exp(-r * T)
    assert abs((c - p) - parity) < max(1e-4 * S, 1e-2)


@settings(max_examples=40, deadline=None)
@given(spots, maturities, rates, rates, vols)
def test_price_monotone_in_vol(S, T, r, q, sigma):
    lo = float(bs.bs_price(S, S, T, r, q, sigma, True))
    hi = float(bs.bs_price(S, S, T, r, q, sigma * 1.2, True))
    assert hi >= lo - 1e-3 * S


@settings(max_examples=40, deadline=None)
@given(spots, moneyness, maturities, rates, rates, vols)
def test_delta_bounds(S, m, T, r, q, sigma):
    K = S * m
    d_call = float(bs.bs_delta(S, K, T, r, q, sigma, True))
    d_put = float(bs.bs_delta(S, K, T, r, q, sigma, False))
    assert -1e-6 <= d_call <= 1.0 + 1e-6
    assert -1.0 - 1e-6 <= d_put <= 1e-6
    # Call and put deltas differ by e^{-qT} (parity differentiated).
    assert abs((d_call - d_put) - np.exp(-q * T)) < 2e-3


@settings(max_examples=30, deadline=None)
@given(spots, maturities, rates, rates, vols)
def test_iv_roundtrip_property(S, T, r, q, sigma):
    from scipy.stats import norm

    from mcos_tpu.engine.surface import implied_vol

    # f64 quote so the inversion is information-complete.
    sqrt_t = np.sqrt(T)
    d1 = (np.log(1.0) + (r - q + sigma**2 / 2) * T) / (sigma * sqrt_t)
    d2 = d1 - sigma * sqrt_t
    price = S * np.exp(-q * T) * norm.cdf(d1) - S * np.exp(-r * T) * norm.cdf(d2)
    iv = implied_vol(price, S, S, T, r, q, True)
    assert iv is not None
    assert abs(iv - sigma) < 1e-5 * max(sigma, 1.0)
