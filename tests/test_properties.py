"""Property-based tests (hypothesis): no-arbitrage bounds and consistency
relations that must hold for EVERY parameterization, not just fixtures."""

import numpy as np
import pytest
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


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_owen_scramble_is_bijective_nested_permutation(seed):
    """For ANY hash seed, Owen scrambling must permute each dyadic prefix
    class bijectively (the net-preservation property)."""
    import jax.numpy as jnp

    from mcos_tpu.ops import sobol

    x = jnp.arange(0, 2**12, dtype=jnp.uint32) << 18  # 12-bit prefixes
    y = np.asarray(sobol._owen_scramble30(x[None, :], jnp.uint32(seed)))[0]
    for k in (1, 6, 12):
        c = np.bincount((y >> (30 - k)).astype(int), minlength=2**k)
        assert c.min() == c.max() == 2**12 // 2**k


@settings(max_examples=8, deadline=None)
@given(st.floats(min_value=0.2, max_value=3.0),
       st.floats(min_value=0.02, max_value=0.2),
       st.floats(min_value=0.05, max_value=1.0))
def test_variance_swap_legs_positive_and_additive(lam, sig_j, T):
    """Fair variance = diffusion leg + jump leg for any jump intensity."""
    from mcos_tpu.engine.exotics import variance_swap_fair_strike
    from mcos_tpu.models.params import SVJParams

    p = SVJParams(lambda_j=lam, sigma_j=sig_j)
    out = variance_swap_fair_strike(p, T)
    assert out["fair_variance"] == pytest.approx(
        out["diffusion_leg"] + out["jump_leg"])
    assert out["jump_leg"] == pytest.approx(
        lam * (float(p.mu_j) ** 2 + sig_j**2))
    assert out["fair_vol_strike"] > 0


@settings(max_examples=6, deadline=None)
@given(st.floats(min_value=0.9, max_value=1.1),
       st.integers(min_value=0, max_value=10_000))
def test_qe_sobol_put_call_parity(m, seed):
    """Put-call parity holds for the fused QMC-QE configuration at any
    strike/seed (the two sides share one path set, so parity is exact up
    to the CV adjustment noise)."""
    from mcos_tpu.engine.pricer import MonteCarloEngine
    from mcos_tpu.models.params import SVJParams

    p = SVJParams()
    S, T = 22500.0, 0.1
    K = S * m
    eng = MonteCarloEngine(p, num_paths=16_384, num_steps=32, seed=seed,
                           use_sobol=True, scheme="qe")
    call = eng.price(S, K, T, True)["price"]
    put = eng.price(S, K, T, False)["price"]
    r, q = float(p.r), float(p.q)
    parity = S * np.exp(-q * T) - K * np.exp(-r * T)
    assert call - put == pytest.approx(parity, abs=0.02 * S * 0.05 + 3.0)


# ─────────────────────────────────────────────────────────────────────────────
# Barrier-family oracle properties (host f64, no MC)
# ─────────────────────────────────────────────────────────────────────────────
_bvols = st.floats(0.1, 0.6)
_bups = st.floats(1.05, 1.6)      # upper barrier / spot
_blos = st.floats(0.5, 0.95)      # lower barrier / spot
_wfrac = st.tuples(st.floats(0.0, 0.9), st.floats(0.05, 1.0))


def _window(T, wf):
    a, b = wf
    t1 = a * T
    t2 = min(T, t1 + max(b * (T - t1), 0.02 * T))
    return t1, t2


@settings(max_examples=40, deadline=None)
@given(st.floats(50.0, 500.0), st.floats(0.8, 1.2), st.floats(0.1, 1.5),
       rates, rates, _bvols, _bups, _wfrac)
def test_window_in_out_parity(S, m, T, r, q, sigma, bu, wf):
    from mcos_tpu.ops import exotics as ox

    K, B = S * m, S * bu
    t1, t2 = _window(T, wf)
    ko = ox.window_barrier_bs(S, K, T, r, q, sigma, B, t1, t2)
    ki = ox.window_barrier_bs(S, K, T, r, q, sigma, B, t1, t2, knock="in")
    vanilla = ox.barrier_bs(S, K, T, r, q, sigma, 1e9, is_call=True,
                            knock="out", direction="up")
    assert ko + ki == pytest.approx(vanilla, rel=2e-6, abs=1e-9)
    assert -1e-12 <= ko <= vanilla + 1e-9


@settings(max_examples=40, deadline=None)
@given(st.floats(50.0, 500.0), st.floats(0.1, 1.5), rates, rates, _bvols,
       _bups, _blos, _wfrac)
def test_window_nesting_and_corridor_dominance(S, T, r, q, sigma, bu, bl,
                                               wf):
    """A wider monitoring window can only knock MORE: KO decreasing in
    window inclusion; a corridor KO is dominated by either single KO; the
    windowed no-touch lies in [0, df] and dominates the full-window one."""
    from mcos_tpu.ops import exotics as ox

    K, B, L = S, S * bu, S * bl
    t1, t2 = _window(T, wf)
    ko_win = ox.window_barrier_bs(S, K, T, r, q, sigma, B, t1, t2)
    ko_full = ox.barrier_bs(S, K, T, r, q, sigma, B, is_call=True,
                            knock="out", direction="up")
    assert ko_full <= ko_win + 2e-6 * max(ko_win, 1.0)
    dko_win = ox.window_barrier_bs(S, K, T, r, q, sigma, B, t1, t2,
                                   barrier_lo=L)
    assert dko_win <= ko_win + 2e-6 * max(ko_win, 1.0)
    df = np.exp(-r * T)
    nt_win = ox.window_no_touch_bs(S, T, r, q, sigma, B, t1, t2)
    nt_full = ox.window_no_touch_bs(S, T, r, q, sigma, B, 0.0, T)
    assert -1e-12 <= nt_full <= nt_win + 1e-9 <= df + 1e-6
    cnt_win = ox.window_no_touch_bs(S, T, r, q, sigma, B, t1, t2,
                                    barrier_lo=L)
    assert cnt_win <= nt_win + 1e-9


@settings(max_examples=40, deadline=None)
@given(st.floats(50.0, 500.0), st.floats(0.1, 1.5), rates, rates, _bvols,
       _bups, st.floats(0.0, 10.0))
def test_rebate_linearity_in_closed_forms(S, T, r, q, sigma, bu, R):
    """KO(R) = KO(0) + R*one_touch and KI(R) = KI(0) + R*no_touch — the
    rebate composition the engine implements must be linear in R."""
    from mcos_tpu.ops import exotics as ox

    B = S * bu
    df = np.exp(-r * T)
    ot = ox.one_touch_bs(S, T, r, q, sigma, B, "up")
    assert -1e-12 <= ot <= df + 1e-9
    ko0 = ox.barrier_bs(S, S, T, r, q, sigma, B, is_call=True, knock="out",
                        direction="up")
    # the engine's composition: price with rebate == base + R*touch leg
    assert ko0 + R * ot == pytest.approx(ko0 + R * ot)  # tautology guard
    # meaningful check: in-out with rebates telescopes to vanilla + R*df
    ki0 = ox.barrier_bs(S, S, T, r, q, sigma, B, is_call=True, knock="in",
                        direction="up")
    lhs = (ko0 + R * ot) + (ki0 + R * (df - ot))
    vanilla = ox.barrier_bs(S, S, T, r, q, sigma, 1e9, is_call=True,
                            knock="out", direction="up")
    assert lhs == pytest.approx(vanilla + R * df, rel=2e-6, abs=1e-9)
