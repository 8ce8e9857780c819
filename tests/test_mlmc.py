"""Multilevel Monte Carlo: coupling quality and oracle agreement."""

import jax
import numpy as np
import pytest

from mcos_tpu.engine.mlmc import _coupled_level, _level_zero, mlmc_price
from mcos_tpu.models.params import SVJParams, gbm_params
from mcos_tpu.ops.cos_pricer import cos_price
from mcos_tpu.ops.bs import bs_price

SVJ = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
                lambda_j=1.0, mu_j=-0.05, sigma_j=0.1)
SPOT = 22500.0


def test_correction_variance_decays():
    """The whole point of MLMC: V_l must fall geometrically with level.
    (The naive Bernoulli jump coupling kept V_l flat at ~payoff variance —
    the exact-Poisson shared-jump coupling is what this pins.)"""
    vs = []
    for lvl in (1, 2, 3):
        m, m2 = _coupled_level(SVJ, SPOT, SPOT, 0.25, jax.random.key(lvl),
                               num_paths=16_384,
                               num_coarse_steps=4 * 2 ** (lvl - 1),
                               is_call=True)
        vs.append(float(m2) - float(m) ** 2)
    assert vs[1] < 0.6 * vs[0]
    assert vs[2] < 0.6 * vs[1]


def test_level_zero_matches_bs_in_gbm_mode():
    p = gbm_params(0.2, r=0.065, q=0.012)
    m, m2 = _level_zero(p, 100.0, 100.0, 0.25, jax.random.key(0),
                        num_paths=65_536, num_steps=8, is_call=True)
    se = np.sqrt(max(float(m2) - float(m) ** 2, 0.0) / 65_536)
    ref = float(bs_price(100.0, 100.0, 0.25, 0.065, 0.012, 0.2, True))
    # Coarse-grid Euler: small discretization bias allowed on top of noise.
    assert abs(float(m) - ref) < 4 * se + 0.05 * ref


def test_mlmc_matches_cos_oracle():
    """Full driver vs the semi-analytic Bates price (MLMC's Poisson jumps
    are the exact law the COS oracle prices)."""
    exact = float(cos_price(SVJ, SPOT, [SPOT], 0.25, True)[0])
    out = mlmc_price(SVJ, SPOT, SPOT, 0.25, eps=1.0, seed=3,
                     max_paths_per_level=1 << 20)
    tol = 3 * (out["std_error"] + out["bias_estimate"]) + 1.0
    assert abs(out["price"] - exact) < tol
    assert out["num_levels"] >= 3
    # Allocation sanity: coarser levels get (weakly) more paths.
    ns = [lv["n"] for lv in out["levels"]]
    assert ns[0] >= ns[-1]
