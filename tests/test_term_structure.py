"""Term-structure SVJ: curve interpolation, surface bootstrap, grid pricing."""

import numpy as np
import pytest

from mcos_tpu.engine.pricer import price_term_structure
from mcos_tpu.models.params import (
    SVJParams,
    TermStructureSVJ,
    build_term_structure_from_surface,
    extract_forward_variance,
)


def test_curve_interpolation():
    ts = TermStructureSVJ(theta_curve={0.1: 0.04, 1.0: 0.09},
                          xi_curve={0.1: 1.0, 1.0: 0.4},
                          lambda_curve={0.1: 3.0, 1.0: 1.0})
    # Flat extrapolation at the ends (models.py:134-137).
    assert ts.get_params_at_maturity(0.05).theta == pytest.approx(0.04)
    assert ts.get_params_at_maturity(2.0).theta == pytest.approx(0.09)
    # Linear in between.
    mid = ts.get_params_at_maturity(0.55)
    assert float(mid.theta) == pytest.approx(0.065, rel=1e-6)
    assert float(mid.xi) == pytest.approx(0.7, rel=1e-6)
    assert float(mid.lambda_j) == pytest.approx(2.0, rel=1e-6)
    # Defaults when a curve is empty.
    empty = TermStructureSVJ()
    assert empty.get_params_at_maturity(0.5).theta == pytest.approx(0.04)


def test_bootstrap_from_surface():
    """models.py:161-194 heuristics: θ(T)=IV², ξ scaled by min(3, 1/√T),
    λ scaled by |skew|/0.03."""
    base = SVJParams(xi=0.5, lambda_j=1.0)
    mats = np.array([0.05, 0.25, 1.0])
    atm_ivs = np.array([0.18, 0.20, 0.22])
    skews = np.array([0.06, 0.03, 0.015])
    ts = build_term_structure_from_surface(mats, atm_ivs, skews, base)

    assert ts.v0 == pytest.approx(extract_forward_variance(0.18, 0.05))
    assert ts.theta_curve[0.25] == pytest.approx(0.04, rel=1e-6)
    # ξ scale capped at 3 for the weekly expiry (1/√0.05 ≈ 4.47 → 3).
    assert ts.xi_curve[0.05] == pytest.approx(0.5 * 3.0, rel=1e-6)
    assert ts.xi_curve[1.0] == pytest.approx(0.5, rel=1e-6)
    # λ scale = max(1, |skew|/0.03).
    assert ts.lambda_curve[0.05] == pytest.approx(2.0, rel=1e-6)
    assert ts.lambda_curve[1.0] == pytest.approx(1.0, rel=1e-6)


def test_price_term_structure_grid():
    ts = TermStructureSVJ(v0=0.04,
                          theta_curve={0.1: 0.04, 0.5: 0.06},
                          xi_curve={0.1: 0.3, 0.5: 0.3},
                          lambda_curve={0.1: 0.0, 0.5: 0.0})
    strikes = [21000.0, 22500.0, 24000.0]
    grid = price_term_structure(ts, 22500.0, strikes, [0.1, 0.5],
                                num_paths=20_000, num_steps=64)
    assert len(grid) == 2
    for slice_ in grid:
        chain = slice_["chain"]
        assert len(chain) == 3
        assert chain[0]["price"] > chain[1]["price"] > chain[2]["price"]
    # Longer maturity ⇒ more time value at ATM.
    assert grid[1]["chain"][1]["price"] > grid[0]["chain"][1]["price"]
    # Interpolated θ recorded per maturity.
    assert grid[1]["params"]["theta"] == pytest.approx(0.06, rel=1e-5)
