"""Path simulator correctness: martingale property, BS oracle, antithetic/QMC.

The key oracle mirrors the reference's smoke test (verify.py:26-42): with
degenerate SVJ parameters the engine must reproduce Black-Scholes within MC
confidence bands.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops import simulate
from mcos_tpu.ops.bs import bs_price

KEY = jax.random.key(0)


def test_terminal_shape_and_finite():
    p = SVJParams()
    s, v, _ = simulate.simulate_terminal(p, 100.0, 0.5, KEY,
                                      num_paths=4096, num_steps=32)
    assert s.shape == (2, 4096) and v.shape == (2, 4096)
    assert bool(jnp.all(jnp.isfinite(s))) and bool(jnp.all(v >= 0))


def test_gbm_martingale():
    """E[S_T e^{-(r-q)T}] = S0 for a pure GBM (no jumps)."""
    p = gbm_params(0.2, r=0.05, q=0.01)
    s, _, _ = simulate.simulate_terminal(p, 100.0, 1.0, KEY,
                                      num_paths=200_000, num_steps=64)
    fwd = float(jnp.mean(s)) * np.exp(-(0.05 - 0.01) * 1.0)
    se = float(jnp.std(s)) / np.sqrt(s.size) * np.exp(-0.04)
    assert abs(fwd - 100.0) < 4 * se


def test_jump_compensated_martingale():
    """Drift compensation keeps the discounted spot a martingale with jumps on."""
    p = SVJParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.5, v0=0.04,
                  lambda_j=2.0, mu_j=-0.05, sigma_j=0.15, r=0.05, q=0.0)
    s, _, _ = simulate.simulate_terminal(p, 100.0, 1.0, KEY,
                                      num_paths=200_000, num_steps=128)
    mean = float(jnp.mean(s)) * np.exp(-0.05)
    se = float(jnp.std(s)) / np.sqrt(s.size) * np.exp(-0.05)
    assert abs(mean - 100.0) < 5 * se


def test_degenerate_svj_matches_bs():
    """verify.py:26-42 oracle: ξ=0, λ=0 ⇒ Black-Scholes within 3σ."""
    sigma = 0.2
    p = gbm_params(sigma, r=0.065, q=0.012)
    spot = strike = 22500.0
    T = 0.04
    s, _, _ = simulate.simulate_terminal(p, spot, T, KEY,
                                      num_paths=100_000, num_steps=100)
    pay = simulate.combine_antithetic(simulate.vanilla_payoff(s, strike, True))
    mean, se = simulate.mc_mean_stderr(pay)
    disc = np.exp(-0.065 * T)
    mc = disc * float(mean)
    ref = float(bs_price(spot, strike, T, 0.065, 0.012, sigma, True))
    assert abs(mc - ref) < 3 * disc * float(se)
    assert abs(mc - ref) < 20.0  # the reference's ₹20 tolerance


def test_antithetic_reduces_variance():
    sigma = 0.2
    p = gbm_params(sigma)
    spot, strike, T = 100.0, 100.0, 0.5

    s_anti, _, _ = simulate.simulate_terminal(p, spot, T, KEY,
                                              num_paths=50_000, num_steps=32,
                                              antithetic=True)
    s_raw, _, _ = simulate.simulate_terminal(p, spot, T, KEY,
                                             num_paths=100_000, num_steps=32,
                                             antithetic=False)
    pay_a = simulate.combine_antithetic(simulate.vanilla_payoff(s_anti, strike, True))
    pay_r = simulate.vanilla_payoff(s_raw[0], strike, True)
    # Equal total path budget: 2×50k antithetic vs 100k raw.
    _, se_a = simulate.mc_mean_stderr(pay_a)
    _, se_r = simulate.mc_mean_stderr(pay_r)
    assert float(se_a) * np.sqrt(50_000) < float(se_r) * np.sqrt(100_000)


def test_from_draws_matches_reference_layout():
    """Pre-drawn randoms path (CRN/QMC) agrees with in-scan threefry in law."""
    p = SVJParams(lambda_j=0.0)
    n, steps = 50_000, 16
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.standard_normal((n, steps)), jnp.float32)
    z2 = jnp.asarray(rng.standard_normal((n, steps)), jnp.float32)
    zj = jnp.asarray(rng.standard_normal((n, steps)), jnp.float32)
    u = jnp.asarray(rng.random((n, steps)), jnp.float32)
    s1, _, _ = simulate.simulate_terminal_from_draws(p, 100.0, 0.25, z1, z2, u, zj)
    s2, _, _ = simulate.simulate_terminal(p, 100.0, 0.25, KEY,
                                          num_paths=n, num_steps=steps)
    m1, se1 = float(jnp.mean(s1)), float(jnp.std(s1)) / np.sqrt(n)
    m2 = float(jnp.mean(s2))
    assert abs(m1 - m2) < 6 * se1


def test_recorded_paths():
    p = SVJParams()
    paths = simulate.simulate_paths_recorded(p, 100.0, 0.25, KEY,
                                             num_paths=50, num_steps=60)
    assert paths.shape == (50, 61)
    assert bool(jnp.all(paths[:, 0] == 100.0))
    assert bool(jnp.all(paths > 0))


def test_crn_determinism():
    """Same key ⇒ bit-identical paths (the CRN property Greeks rely on)."""
    p = SVJParams()
    s1, _, _ = simulate.simulate_terminal(p, 100.0, 0.5, KEY, num_paths=1024, num_steps=16)
    s2, _, _ = simulate.simulate_terminal(p, 100.0, 0.5, KEY, num_paths=1024, num_steps=16)
    assert bool(jnp.all(s1 == s2))


def test_high_step_count_forward_unbiased():
    """Regression: with an absolute-log f32 carry, the path-identical drift
    increment (~1e-5) quantizes against log S ≈ 10 (ulp ~1e-6) the same way
    every step, biasing E[S_T] by ~6e-4 at 4000 steps. The log(S/S0) carry
    must keep the forward within MC noise (~3e-5 at this n) at any depth."""
    p = gbm_params(0.2, r=0.065, q=0.012)
    spot, T = 22500.0, 0.25
    n = 1 << 18
    fwd = spot * np.exp(np.float32(0.053 * T))
    for steps in (250, 4000):
        s, _, _ = simulate.simulate_terminal(p, spot, T, KEY,
                                             num_paths=n, num_steps=steps)
        ratio = float(jnp.mean(s)) / float(fwd)
        assert abs(ratio - 1.0) < 1.5e-4, (steps, ratio)
