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
