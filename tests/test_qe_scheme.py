"""Andersen QE scheme: near-exact Heston stepping vs the COS oracle.

The headline claim: QE at 16 steps matches the semi-analytic price where
Euler full truncation at 16 steps is measurably biased — an
order-of-magnitude effective-throughput win at fixed accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops import simulate
from mcos_tpu.ops.cos_pricer import cos_price

S = 22500.0
R, Q = 0.065, 0.012
# High vol-of-vol Heston: Euler's full-truncation bias is large here.
HESTON = SVJParams(kappa=1.0, theta=0.09, xi=1.0, rho=-0.7, v0=0.04,
                   lambda_j=0.0, mu_j=0.0, sigma_j=0.01, r=R, q=Q)


def _mc_price(sim_fn, params, T, steps, n=400_000, seed=0, strike=S):
    s_final, _, _ = sim_fn(params, S, T, jax.random.key(seed),
                           num_paths=n, num_steps=steps)
    pay = simulate.combine_antithetic(
        simulate.vanilla_payoff(s_final, strike, True))
    mean, se = simulate.mc_mean_stderr(pay)
    disc = np.exp(-R * T)
    return disc * float(mean), disc * float(se)


def test_qe_accurate_at_16_steps_where_euler_is_not():
    T = 1.0
    exact = float(cos_price(HESTON, S, [S], T, True)[0])
    qe, qe_se = _mc_price(simulate.simulate_terminal_qe, HESTON, T, 16)
    euler, eu_se = _mc_price(simulate.simulate_terminal, HESTON, T, 16)
    qe_err = abs(qe - exact)
    euler_err = abs(euler - exact)
    # QE within MC bands (+small residual); Euler measurably biased.
    assert qe_err < 4 * qe_se + 0.002 * exact, (qe, exact, qe_se)
    assert euler_err > 2 * qe_err, (euler_err, qe_err)
    assert euler_err > 6 * eu_se  # Euler's gap is bias, not noise


def test_qe_converges_with_jumps():
    p = SVJParams(kappa=2.0, theta=0.05, xi=0.6, rho=-0.6, v0=0.04,
                  lambda_j=1.5, mu_j=-0.07, sigma_j=0.12, r=R, q=Q)
    T = 0.5
    exact = float(cos_price(p, S, [S], T, True)[0])
    qe, se = _mc_price(simulate.simulate_terminal_qe, p, T, 32, seed=3)
    assert abs(qe - exact) < 4 * se + 0.003 * exact


def test_qe_degenerate_gbm_limit():
    p = gbm_params(0.2, r=R, q=Q)
    T = 0.25
    from mcos_tpu.ops.bs import bs_price
    ref = float(bs_price(S, S, T, R, Q, 0.2, True))
    qe, se = _mc_price(simulate.simulate_terminal_qe, p, T, 16, n=200_000)
    assert abs(qe - ref) < 4 * se + 0.002 * ref


def test_qe_variance_stays_nonnegative_and_finite():
    s, v, g = simulate.simulate_terminal_qe(
        HESTON, S, 1.0, jax.random.key(1), num_paths=8192, num_steps=16,
        companion=True)
    assert bool(jnp.all(v >= 0.0))
    assert bool(jnp.all(jnp.isfinite(s))) and bool(jnp.all(jnp.isfinite(g)))


def test_qe_antithetic_shares_variance_path():
    """The variance uniform is shared across the antithetic pair: v branches
    must be identical, spot branches anti-correlated."""
    s, v, _ = simulate.simulate_terminal_qe(
        HESTON, S, 0.5, jax.random.key(2), num_paths=4096, num_steps=8)
    np.testing.assert_allclose(np.asarray(v[0]), np.asarray(v[1]), rtol=1e-6)
    # With ρ=−0.7 the shared variance path carries ~ρ² of the spot variance
    # (common across the pair), so only the idiosyncratic part flips sign:
    # expect clearly sub-unit correlation, not strong anti-correlation.
    corr = np.corrcoef(np.log(np.asarray(s[0])), np.log(np.asarray(s[1])))[0, 1]
    assert corr < 0.3


def test_qe_sobol_driver_matches_cos():
    """The scheme x driver matrix is complete: QE + Sobol (u_v consumed as
    raw uniforms, z_x bridge-ordered) reproduces the COS oracle at a step
    count where QE is essentially exact."""
    import jax.numpy as jnp

    from mcos_tpu.engine.pricer import MonteCarloEngine

    p = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                  lambda_j=1.0, mu_j=-0.05, sigma_j=0.1)
    S, T = 22500.0, 0.25
    exact = float(cos_price(p, S, [S], T, True)[0])
    eng = MonteCarloEngine(p, num_paths=1 << 16, num_steps=64, seed=9,
                           use_sobol=True, scheme="qe")
    res = eng.price(S, S, T)
    assert abs(res["price"] - exact) < max(4 * res["std_error"], 1.5)


def test_engine_draws_cache_reused():
    """Sobol draw sets are cached at module level (keyed on scheme/steps/
    paths/seed), so repeated pricing reuses the same device buffers even
    across engine INSTANCES — the HTTP layer builds a fresh engine per
    request; a different seed keys a fresh draw set."""
    from mcos_tpu.engine.pricer import MonteCarloEngine
    from mcos_tpu.models.params import gbm_params

    eng = MonteCarloEngine(gbm_params(0.2), num_paths=4096, num_steps=16,
                           seed=5, use_sobol=True)
    eng.price(100.0, 100.0, 0.1)
    d1 = eng._sobol_draws(eng._steps(0.1))
    eng.price(100.0, 105.0, 0.1)
    d2 = eng._sobol_draws(eng._steps(0.1))
    assert d1[0] is d2[0]  # same device buffer, no regeneration
    # Fresh instance, same keying attributes → same cached buffers.
    eng_b = MonteCarloEngine(gbm_params(0.2), num_paths=4096, num_steps=16,
                             seed=5, use_sobol=True)
    assert eng_b._sobol_draws(eng_b._steps(0.1))[0] is d1[0]
    eng.seed = 6
    eng.price(100.0, 100.0, 0.1)
    assert eng._sobol_draws(eng._steps(0.1))[0] is not d1[0]
