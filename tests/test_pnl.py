"""P&L explain: null move, attribution completeness, and residual order."""

import dataclasses

import numpy as np
import pytest

from mcos_tpu.engine.pnl import pnl_explain
from mcos_tpu.models.params import SVJParams

P = SVJParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6, v0=0.04,
              lambda_j=1.0, mu_j=-0.05, sigma_j=0.1, r=0.065, q=0.012)
S, K, T = 22500.0, 22500.0, 0.25


def test_null_move_attributes_nothing():
    out = pnl_explain(P, P, S, S, T, T, K)
    assert out["total_pnl"] == 0.0
    assert out["unexplained"] == 0.0
    assert out["attribution"]["delta"] == 0.0


def test_explained_plus_unexplained_is_total_exactly():
    p_new = dataclasses.replace(P, v0=0.047, xi=0.45)
    out = pnl_explain(P, p_new, S, S * 0.985, T, T - 1 / 252, K)
    assert out["explained"] + out["unexplained"] == pytest.approx(
        out["total_pnl"], abs=1e-9)


def test_realistic_day_residual_below_one_percent():
    # spot -1%, vol level up, one day passes: the Greeks + second-order
    # terms must explain >99% of the move.
    p_new = dataclasses.replace(P, v0=0.047, theta=0.052)
    out = pnl_explain(P, p_new, S, S * 0.99, T, T - 1 / 252, K)
    assert abs(out["unexplained"]) < 0.01 * abs(out["total_pnl"])
    att = out["attribution"]
    assert att["delta"] < 0           # short a falling spot... long call
    assert att["time_decay"] < 0      # long option bleeds
    assert att["v0"] > 0              # vol up helps the long call


def test_spot_only_move_is_delta_gamma():
    out = pnl_explain(P, P, S, S * 1.005, T, T, K)
    att = out["attribution"]
    assert set(k for k, v in att.items() if v != 0.0) <= {
        "delta", "gamma", "time_decay"}
    assert att["time_decay"] == 0.0
    # delta + gamma capture a 50bp move to ~0.1%
    assert abs(out["unexplained"]) < 1e-3 * abs(out["total_pnl"]) + 0.01


def test_residual_scales_as_third_order():
    # Doubling a pure-spot move should grow the residual ~8x (O(dS^3)).
    r1 = pnl_explain(P, P, S, S * 1.01, T, T, K)["unexplained"]
    r2 = pnl_explain(P, P, S, S * 1.02, T, T, K)["unexplained"]
    assert abs(r2) > 4 * abs(r1)
    assert abs(r2) < 16 * abs(r1)


def test_crash_day_flags_large_unexplained():
    # -10% gap: third-order terms are real money; the report must show it.
    out = pnl_explain(P, P, S, S * 0.90, T, T, K)
    assert abs(out["unexplained"]) > 10 * abs(
        pnl_explain(P, P, S, S * 0.99, T, T, K)["unexplained"])


def test_quantity_scales_linearly():
    p_new = dataclasses.replace(P, v0=0.045)
    a = pnl_explain(P, p_new, S, S * 0.995, T, T - 1 / 252, K,
                    quantity=1.0)
    b = pnl_explain(P, p_new, S, S * 0.995, T, T - 1 / 252, K,
                    quantity=-3.0)
    assert b["total_pnl"] == pytest.approx(-3.0 * a["total_pnl"], rel=1e-9)
    assert b["attribution"]["delta"] == pytest.approx(
        -3.0 * a["attribution"]["delta"], rel=1e-9)
