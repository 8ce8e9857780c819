"""Book engine: vmapped portfolio pricing vs per-contract BS oracle."""

import numpy as np
import pytest

from mcos_tpu.engine.book import BookEngine
from mcos_tpu.models.params import gbm_params
from mcos_tpu.ops.bs import bs_all_greeks

R, Q, SIGMA = 0.065, 0.012, 0.2


def test_book_matches_bs_per_position():
    eng = BookEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=30_000,
                     num_steps=48, seed=9)
    spots = [22500.0, 22500.0, 22500.0, 18000.0]
    strikes = [22500.0, 21000.0, 24000.0, 18500.0]
    Ts = [0.1, 0.25, 0.5, 0.08]
    is_calls = [True, True, False, False]

    out = eng.price_book(spots, strikes, Ts, is_calls)
    assert out["num_positions"] == 4
    for i in range(4):
        g = bs_all_greeks(spots[i], strikes[i], Ts[i], R, Q, SIGMA,
                          is_calls[i])
        tol_p = max(4 * out["std_error"][i], 0.01 * float(g["price"]) + 0.5)
        assert abs(out["price"][i] - float(g["price"])) < tol_p, f"pos {i}"
        assert out["delta"][i] == pytest.approx(float(g["delta"]), abs=0.02)
        assert out["theta"][i] == pytest.approx(float(g["theta"]), rel=0.1)
        # vega is per vol point (∂P/∂σ), rho per unit rate — BS conventions.
        assert out["vega"][i] == pytest.approx(float(g["vega"]), rel=0.05)
        assert out["rho"][i] == pytest.approx(float(g["rho"]), rel=0.05)


def test_book_aggregates_with_quantities():
    eng = BookEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=20_000,
                     num_steps=32, seed=1)
    spots = [100.0, 100.0]
    strikes = [100.0, 100.0]
    Ts = [0.25, 0.25]
    is_calls = [True, True]
    # Long one, short one → flat book.
    out = eng.price_book(spots, strikes, Ts, is_calls, quantities=[1.0, -1.0])
    assert out["book_value"] == pytest.approx(0.0, abs=1e-4)
    assert out["book_delta"] == pytest.approx(0.0, abs=1e-6)
    assert out["book_vega"] == pytest.approx(0.0, abs=1e-4)
    assert out["book_rho"] == pytest.approx(0.0, abs=1e-4)


def test_book_straddle_delta_small():
    """ATM straddle: call delta + put delta ≈ e^{-qT}(2N(d1)−1), small."""
    eng = BookEngine(gbm_params(SIGMA, r=R, q=Q), num_paths=50_000,
                     num_steps=32, seed=2)
    out = eng.price_book([100.0, 100.0], [100.0, 100.0], [0.25, 0.25],
                         [True, False])
    assert abs(out["book_delta"]) < 0.25
    assert out["book_value"] > 0
