"""Sobol generator and Brownian-bridge construction matrix."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcos_tpu.ops import sobol


def test_direction_numbers_shape():
    sv = sobol.sobol_direction_numbers(16)
    assert sv.shape == (16, 30)
    assert sv.dtype == np.uint32
    # First dimension of a Sobol sequence is the van der Corput sequence:
    # leading direction number is 2^29 (MSB of the 30-bit integer).
    assert sv[0, 0] == 1 << 29


def test_bb_matrix_covariance():
    """M must satisfy M Mᵀ = Cov(dW) = (dt)·I for unit-horizon increments."""
    for n in (4, 7, 16, 50):
        m = sobol.brownian_bridge_matrix(n)
        cov = m @ m.T
        expected = np.eye(n) / n
        np.testing.assert_allclose(cov, expected, atol=1e-6)


def test_bb_first_dim_drives_endpoint():
    """First construction dim must drive W(1): row sums of M give W(1) coeffs,
    which should be e₀ (the reference's bridge pins W(T)=0 instead — the bug
    documented in mcos_tpu/ops/sobol.py)."""
    n = 16
    m = sobol.brownian_bridge_matrix(n)
    w_T_coeffs = m.sum(axis=0)  # W(1) = Σ dW_i = Σ_k coeff_k · Z_k
    expected = np.zeros(n)
    expected[0] = 1.0
    np.testing.assert_allclose(w_T_coeffs, expected, atol=1e-6)


def test_sobol_uniform_moments():
    z = np.asarray(sobol.sobol_normals(4096, 8, seed=1))
    assert z.shape == (4096, 8)
    # QMC normals: mean ≈ 0 and var ≈ 1 far tighter than MC at this n.
    assert np.all(np.abs(z.mean(axis=0)) < 0.01)
    assert np.all(np.abs(z.var(axis=0) - 1.0) < 0.02)


def test_sobol_low_discrepancy_vs_prng():
    """|mean| of Sobol normals beats PRNG by a wide margin."""
    z_sob = np.asarray(sobol.sobol_normals(2048, 4, seed=0))
    rng = np.random.default_rng(0)
    z_prn = rng.standard_normal((2048, 4))
    assert np.abs(z_sob.mean()) < 0.1 * max(np.abs(z_prn.mean()), 1e-3) + 1e-3


def test_svj_draws_shapes_and_scaling():
    # Default layout is steps-major (the zero-transpose hot path).
    z1, z2, u, zj = sobol.sobol_svj_draws(1024, 16, seed=3)
    for a in (z1, z2, u, zj):
        assert a.shape == (16, 1024)
    # "paths" layout reproduces the reference orientation, same values.
    z1p, _, _, _ = sobol.sobol_svj_draws(1024, 16, seed=3, layout="paths")
    np.testing.assert_array_equal(np.asarray(z1p), np.asarray(z1).T)
    # z1 rows are unit-variance normals after the √n rescale.
    v = np.asarray(z1).var(axis=1)
    assert np.all(np.abs(v - 1.0) < 0.1)
    # u is uniform in (0,1)
    u = np.asarray(u)
    assert u.min() > 0 and u.max() < 1
    assert abs(u.mean() - 0.5) < 0.02


def test_svj_draws_layouts_price_identically():
    """steps-major and paths-major must be the same draws, so the two
    simulator entry points price identically."""
    import jax.numpy as jnp

    from mcos_tpu.models.params import SVJParams
    from mcos_tpu.ops.simulate import simulate_terminal_from_draws

    p = SVJParams()
    zs = sobol.sobol_svj_draws(2048, 12, seed=5, layout="steps")
    zp = sobol.sobol_svj_draws(2048, 12, seed=5, layout="paths")
    s_s, _, _ = simulate_terminal_from_draws(p, 100.0, 0.25, *zs,
                                             steps_major=True)
    s_p, _, _ = simulate_terminal_from_draws(p, 100.0, 0.25, *zp)
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_p), rtol=1e-6)


def test_scramble_streams_differ():
    a = np.asarray(sobol.sobol_normals(256, 4, seed=0, stream=0))
    b = np.asarray(sobol.sobol_normals(256, 4, seed=0, stream=1))
    assert not np.allclose(a, b)


def test_owen_scramble_preserves_net_property():
    """Hash-based Owen scrambling is a nested permutation: every dyadic
    prefix histogram of the scrambled 30-bit integers stays exactly uniform
    (checked on the integer lattice — f32 conversion blurs the finest
    boundaries by ~2^-25, which is why this pins ints, not floats)."""
    import jax.numpy as jnp

    sv = jnp.asarray(sobol.sobol_direction_numbers(4))
    zero = jnp.zeros(4, jnp.uint32)
    n = 2**12
    # Recover exact integers: unscrambled ints at n=4096 only use the top
    # 12 bits, so the f32 round-trip is lossless here.
    u = np.asarray(sobol._sobol_uniforms_T(sv, zero, n, "shift"))
    ints = jnp.asarray((u * 2.0**30 - 0.5).round().astype(np.uint32))
    y = np.asarray(sobol._owen_scramble30(ints, jnp.uint32(918273)))
    for k in (1, 4, 8, 10):
        bins = (y >> (30 - k)).astype(int)
        for d in range(4):
            c = np.bincount(bins[d], minlength=2**k)
            assert c.min() == c.max() == n // 2**k, (k, d)


def test_owen_beats_shift_rms():
    """Owen-scrambled nets should have lower randomized-QMC error than
    digital-shift nets on a smooth integrand (the reason to ship it)."""
    import jax
    import jax.numpy as jnp

    sv = jnp.asarray(sobol.sobol_direction_numbers(4))
    exact = 2.0**-4  # ∫ prod(u) du over [0,1]^4

    def err(scramble, seed):
        sh = sobol._scramble_shift(jax.random.key(seed), 4)
        u = np.asarray(sobol._sobol_uniforms_T(sv, sh, 1024, scramble),
                       np.float64)
        return u.prod(axis=0).mean() - exact

    rms = {s: np.sqrt(np.mean([err(s, k) ** 2 for k in range(25)]))
           for s in ("owen", "shift")}
    assert rms["owen"] < rms["shift"]
    assert rms["owen"] < 3e-4  # both are far below MC (~3e-3)


def test_price_rqmc_error_bar():
    """RQMC price: unbiased vs BS in GBM mode, spread-based stderr sane."""
    from mcos_tpu.engine.pricer import MonteCarloEngine
    from mcos_tpu.models.params import gbm_params
    from mcos_tpu.ops.bs import bs_price

    p = gbm_params(0.2, r=0.065, q=0.012)
    eng = MonteCarloEngine(p, num_paths=16_384, num_steps=32, seed=5,
                           use_control_variate=False)
    out = eng.price_rqmc(22500.0, 22500.0, 0.25, randomizations=4)
    ref = float(bs_price(22500.0, 22500.0, 0.25, 0.065, 0.012, 0.2, True))
    assert out["randomizations"] == 4
    assert out["price_min"] <= out["price"] <= out["price_max"]
    assert abs(out["price"] - ref) < max(6 * out["std_error"], 2.0)
