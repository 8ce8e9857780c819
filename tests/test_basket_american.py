"""Multi-asset Bermudan LSM vs the Broadie-Glasserman benchmark & Stulz.

The 2-asset GBM max-call with 9 exercise rights is THE standard
high-dimensional early-exercise benchmark (Broadie & Glasserman 1997;
Andersen & Broadie 2004 report [13.892, 13.934] at S0=100, ~8.08 at 90,
~21.34 at 110 for sigma=0.2, r=5%, q=10%, rho=0, K=100, T=3).
"""

import numpy as np
import pytest

from mcos_tpu.engine.basket import BasketEngine
from mcos_tpu.models.params import gbm_params
from mcos_tpu.ops.rainbow import rainbow_price

# The benchmark's GBM world: sigma=20%, r=5%, q=10% per asset, rho=0.
GBM = gbm_params(0.2, r=0.05, q=0.10)
EYE = [[1.0, 0.0], [0.0, 1.0]]


def _engine(num_paths=100_000, seed=7):
    return BasketEngine([GBM, GBM], EYE, num_paths=num_paths, seed=seed)


@pytest.mark.parametrize("s0,lo,hi", [
    (90.0, 7.95, 8.20), (100.0, 13.75, 14.05), (110.0, 21.15, 21.50)])
def test_bermudan_max_call_broadie_glasserman(s0, lo, hi):
    """The published 9-right max-call values (duality-bracket midpoints
    8.08 / 13.90 / 21.34) within LSM low-bias + MC noise bands."""
    out = _engine().price_american([s0, s0], 100.0, 3.0, kind="max",
                                   n_ex=9, steps_per_period=1)
    assert lo < out["price"] < hi, out


def test_one_right_degenerates_to_stulz():
    """n_ex=1 leaves only the terminal right: the European max-call, which
    has the Stulz closed form."""
    out = _engine().price_american([100.0, 100.0], 100.0, 1.0, kind="max",
                                   n_ex=1, steps_per_period=1)
    exact = rainbow_price(100.0, 100.0, 100.0, 1.0, 0.05, 0.10, 0.10,
                          0.2, 0.2, 0.0, kind="best_of", is_call=True)
    assert abs(out["price"] - exact) < 4 * out["std_error"] + 0.02 * exact


def test_more_rights_worth_more():
    eng = _engine(num_paths=60_000)
    p1 = eng.price_american([100.0] * 2, 100.0, 3.0, kind="max", n_ex=1,
                            steps_per_period=1)["price"]
    p3 = eng.price_american([100.0] * 2, 100.0, 3.0, kind="max", n_ex=3,
                            steps_per_period=1)["price"]
    p9 = eng.price_american([100.0] * 2, 100.0, 3.0, kind="max", n_ex=9,
                            steps_per_period=1)["price"]
    assert p1 < p3 < p9 + 0.05  # small MC slack on the last comparison


def test_min_put_and_basket_put_sane():
    """In a q=0 world (where the r-carry makes put early exercise solidly
    optimal): worst-of put >= basket put >= 0 (min <= weighted mean
    pathwise, so the put on the min pays more); the Bermudan worst-of put
    carries a real premium over its European version (Stulz oracle)."""
    gp = gbm_params(0.2, r=0.05, q=0.0)
    eng = BasketEngine([gp, gp], EYE, num_paths=60_000, seed=7)
    wp = eng.price_american([100.0, 100.0], 100.0, 1.0, kind="min",
                            is_call=False, n_ex=8, steps_per_period=2)
    bp = eng.price_american([100.0, 100.0], 100.0, 1.0, kind="basket",
                            is_call=False, weights=[0.5, 0.5], n_ex=8,
                            steps_per_period=2)
    assert wp["price"] > bp["price"] > 0.0
    # European worst-of put: Stulz parity oracle.
    exact = rainbow_price(100.0, 100.0, 100.0, 1.0, 0.05, 0.0, 0.0,
                          0.2, 0.2, 0.0, kind="worst_of", is_call=False)
    assert wp["price"] > exact + 2 * wp["std_error"]
    wp_eur = eng.price_american([100.0, 100.0], 100.0, 1.0, kind="min",
                                is_call=False, n_ex=1,
                                steps_per_period=16)
    assert abs(wp_eur["price"] - exact) < (4 * wp_eur["std_error"]
                                           + 0.02 * exact)


def test_three_asset_max_call_runs():
    """The sorted-spot basis is width-stable in the asset count; 3-asset
    max-call brackets: above the best pairwise 2-asset value, below the
    sum of singles."""
    eng3 = BasketEngine([GBM] * 3, np.eye(3).tolist(), num_paths=60_000,
                        seed=5)
    p3 = eng3.price_american([100.0] * 3, 100.0, 3.0, kind="max", n_ex=9,
                             steps_per_period=1)["price"]
    p2 = _engine(num_paths=60_000).price_american(
        [100.0] * 2, 100.0, 3.0, kind="max", n_ex=9,
        steps_per_period=1)["price"]
    assert p3 > p2  # a third chance to be the max is worth something
    assert p3 < 40.0


def test_validation():
    eng = _engine(num_paths=1_000)
    with pytest.raises(ValueError, match="kind"):
        eng.price_american([100.0, 100.0], 100.0, 1.0, kind="rainbow")
    with pytest.raises(ValueError, match="weights"):
        eng.price_american([100.0, 100.0], 100.0, 1.0, kind="basket")
    solo = BasketEngine([GBM], [[1.0]], num_paths=1_000)
    with pytest.raises(ValueError, match="2 assets"):
        solo.price_american([100.0], 100.0, 1.0)


def test_api_basket_american():
    from mcos_tpu.api.server import ApiError, handle_basket

    body = {"spots": [100.0, 100.0], "strike": 100.0, "T": 1.0,
            "corr": [[1.0, 0.0], [0.0, 1.0]], "payoff": "best_of",
            "american": True, "n_exercise": 4, "steps_per_period": 2,
            "num_paths": 20_000,
            "params": [{"lambda_j": 0.0, "xi": 1e-4, "q": 0.10}] * 2}
    out = handle_basket(body)
    assert out["kind"] == "max" and out["n_exercise"] == 4
    assert out["price"] > 0 and np.isfinite(out["std_error"])
    with pytest.raises(ApiError):
        handle_basket({**body, "payoff": "spread"})


def test_duality_bracket_contains_published_interval():
    """The honest bracket (out-of-sample LSM lower + Andersen-Broadie dual
    upper) must contain the published 2-asset max-call interval
    [13.892, 13.934] at S0=100 — the exact experiment AB 2004 report."""
    out = _engine().price_bounds_american(
        [100.0, 100.0], 100.0, 3.0, kind="max", n_ex=9,
        steps_per_period=1, n_outer=2048, n_inner=64)
    lo, hi = out["lower_bound"], out["upper_bound"]
    assert lo <= hi + 1e-6
    assert lo - 3 * out["lower_se"] < 13.934
    assert hi + 3 * out["upper_se"] > 13.892
    # The bracket is tight enough to be useful.
    assert out["duality_gap"] < 0.8
    # And actually contains the published midpoint.
    assert lo - 3 * out["lower_se"] < 13.902 < hi + 3 * out["upper_se"]


def test_api_basket_american_with_bounds():
    from mcos_tpu.api.server import handle_basket

    out = handle_basket({
        "spots": [100.0, 100.0], "strike": 100.0, "T": 1.0,
        "corr": [[1.0, 0.0], [0.0, 1.0]], "payoff": "best_of",
        "american": True, "n_exercise": 4, "steps_per_period": 1,
        "num_paths": 20_000, "with_bounds": True, "n_outer": 512,
        "n_inner": 16,
        "params": [{"lambda_j": 0.0, "xi": 1e-4, "q": 0.10}] * 2})
    b = out["bounds"]
    assert b["lower_bound"] <= b["upper_bound"] + 1e-6
    assert b["duality_gap"] < 2.0
