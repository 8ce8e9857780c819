"""Mesh-sharded pricing on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcos_tpu.engine.pricer import MonteCarloEngine
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops.bs import bs_price
from mcos_tpu.parallel import mesh as pmesh


def test_virtual_device_count():
    assert jax.device_count() == 8


def test_sharded_price_matches_bs_oracle():
    p = gbm_params(0.2, r=0.065, q=0.012)
    m = pmesh.make_mesh()
    res = pmesh.sharded_price(
        p, 22500.0, [22500.0], 0.04, jax.random.key(0),
        mesh=m, num_paths=80_000, num_steps=50,
    )
    ref = float(bs_price(22500.0, 22500.0, 0.04, 0.065, 0.012, 0.2, True))
    assert abs(float(res["price"][0]) - ref) < max(
        3 * float(res["std_error"][0]), 1.0)


def test_sharded_price_svj_matches_single_device():
    svj = SVJParams(kappa=3.0, theta=0.06, xi=0.4, rho=-0.6, v0=0.04,
                    lambda_j=1.0, mu_j=-0.05, sigma_j=0.1)
    m = pmesh.make_mesh()
    res = pmesh.sharded_price(
        svj, 22500.0, [22000.0, 22500.0, 23000.0], 0.25, jax.random.key(1),
        mesh=m, num_paths=80_000, num_steps=64,
    )
    eng = MonteCarloEngine(svj, num_paths=80_000, num_steps=256,  # 256*0.25=64
                           use_sobol=False, backend="scan", seed=11)
    single = eng.price_batch(22500.0, [22000.0, 22500.0, 23000.0], 0.25)
    for i in range(3):
        joint = 5 * np.hypot(float(res["std_error"][i]),
                             single[i]["std_error"])
        assert abs(float(res["price"][i]) - single[i]["price"]) < max(joint, 2.0)


def test_sharded_price_deterministic():
    p = gbm_params(0.2)
    m = pmesh.make_mesh()
    kw = dict(mesh=m, num_paths=16_000, num_steps=16)
    r1 = pmesh.sharded_price(p, 100.0, [100.0], 0.5, jax.random.key(3), **kw)
    r2 = pmesh.sharded_price(p, 100.0, [100.0], 0.5, jax.random.key(3), **kw)
    assert float(r1["price"][0]) == float(r2["price"][0])


def test_mesh_2d_shapes():
    m = pmesh.make_mesh_2d(batch=2)
    assert m.shape["batch"] == 2 and m.shape["paths"] == 4


def test_sharded_calibration_step_descends():
    """Three optimizer steps on the 2-D (batch x paths) mesh: the psum-reduced
    loss must be finite and decrease (grad flows through the shard_map)."""
    import jax.numpy as jnp
    from mcos_tpu.engine.calibration import make_sharded_calibration_step

    mesh = pmesh.make_mesh_2d(batch=2)
    step_fn, init_fn = make_sharded_calibration_step(
        mesh, num_paths=2048, num_steps=8, lr=0.1)
    u, opt_state = init_fn(jnp.asarray([3.0, 0.09, 0.5, -0.7, 0.09],
                                       jnp.float32))
    strikes = jnp.linspace(21000.0, 24000.0, 4, dtype=jnp.float32)
    # Market generated at sigma=0.18: the start point (v0=theta=0.09) is
    # far off, so gradient steps must reduce the SSE.
    from mcos_tpu.ops.bs import bs_price
    market = bs_price(22500.0, strikes, 0.25, 0.065, 0.012, 0.18, True)
    weights = jnp.full((4,), 0.25, jnp.float32)

    losses = []
    for i in range(3):
        u, opt_state, loss = step_fn(
            u, opt_state, jnp.float32(22500.0), strikes, jnp.float32(0.25),
            market, weights, jax.random.key(0))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_sharded_qe_scheme():
    from mcos_tpu.ops.bs import bs_price
    p = gbm_params(0.2, r=0.065, q=0.012)
    m = pmesh.make_mesh()
    res = pmesh.sharded_price(
        p, 22500.0, [22500.0], 0.25, jax.random.key(4),
        mesh=m, num_paths=80_000, num_steps=16, scheme="qe")
    ref = float(bs_price(22500.0, 22500.0, 0.25, 0.065, 0.012, 0.2, True))
    assert abs(float(res["price"][0]) - ref) < max(
        4 * float(res["std_error"][0]), 1.0)


def test_sharded_portfolio_var_matches_single_device():
    """Mesh-sharded VaR path (psum moments + distributed exact tail) agrees
    with the single-device estimator on the same workload."""
    import numpy as np
    from jax.sharding import Mesh

    from mcos_tpu.engine.risk import portfolio_var

    spots = [100.0, 200.0, 50.0, 80.0]
    sigmas = [0.2, 0.3, 0.25, 0.15]
    corr = np.eye(4) * 0.7 + 0.3
    w = [0.4, 0.2, 0.2, 0.2]

    sharded = portfolio_var(spots, sigmas, corr, w, 0.1,
                            num_paths=400_000, num_steps=8)
    assert sharded["num_devices"] == len(jax.devices())
    single = portfolio_var(spots, sigmas, corr, w, 0.1,
                           num_paths=400_000, num_steps=8,
                           mesh=Mesh(np.asarray(jax.devices()[:1]),
                                     ("paths",)))
    for k in ("var", "cvar", "mean", "std", "skewness"):
        assert sharded[k] == pytest.approx(single[k], rel=0.05, abs=2e-3), k


def test_sharded_portfolio_var_analytic_lognormal():
    """One asset: S_T/S_0 is exactly lognormal, so the 99% VaR has the
    closed form 1 − exp(μ_log − 2.326·σ√T)."""
    import numpy as np

    from mcos_tpu.engine.risk import portfolio_var

    sigma, T = 0.2, 0.05
    out = portfolio_var([100.0], [sigma], np.eye(1), [1.0], T,
                        r=0.0, q=0.0, num_paths=1_000_000, num_steps=4)
    s = sigma * np.sqrt(T)
    mu_log = -0.5 * sigma**2 * T
    exact = 1.0 - np.exp(mu_log - 2.326 * s)
    assert out["var"] == pytest.approx(exact, rel=0.02)
    assert out["cvar"] > out["var"]


def test_sharded_rough_price_matches_bs_and_single_device():
    """8-device rough Bergomi pricing: degenerate limit hits BS exactly
    (deterministic conditional estimator), full params within joint CI of
    a single-device run."""
    from mcos_tpu.ops.rough import (RoughBergomiParams, rbergomi_chol,
                                    rbergomi_conditional_payoffs)

    m = pmesh.make_mesh()
    deg = RoughBergomiParams(xi=0.04, eta=1e-8, rho=0.0, hurst=0.07)
    out = pmesh.sharded_rough_price(
        deg, 100.0, [95.0, 105.0], 0.5, jax.random.key(3), mesh=m,
        num_paths=8_192, num_steps=32)
    for px, k in zip(np.asarray(out["price"]), [95.0, 105.0]):
        ref = float(bs_price(100.0, k, 0.5, deg.r, deg.q, 0.2, True))
        assert px == pytest.approx(ref, abs=5e-3)
    assert float(out["num_paths_used"]) >= 8_192

    full = RoughBergomiParams(xi=0.04, eta=1.9, rho=-0.9, hurst=0.07)
    sh = pmesh.sharded_rough_price(
        full, 100.0, [100.0], 0.25, jax.random.key(5), mesh=m,
        num_paths=65_536, num_steps=32)
    chol = jnp.asarray(rbergomi_chol(0.07, 0.25, 32))
    pay = rbergomi_conditional_payoffs(
        full, 100.0, jnp.asarray([100.0]), 0.25, chol, jax.random.key(9),
        num_paths=65_536, num_steps=32, is_call=True).mean(axis=0)
    disc = float(np.exp(-full.r * 0.25))
    single = disc * float(pay.mean())
    se1 = disc * float(pay.std()) / np.sqrt(pay.shape[0])
    joint = np.hypot(float(sh["std_error"][0]), se1)
    assert abs(float(sh["price"][0]) - single) < 4 * joint
