"""COS Bermudan/American oracle (ops/cos_bermudan.py): European limits,
CRR/PDE cross-checks, the Merton Poisson-mixture series oracle, the LSM
bracket under jumps, VG/NIG pins, and boundary shape."""

import math

import numpy as np
import pytest

from scipy.stats import norm

from mcos_tpu.engine.american import binomial_american_bs
from mcos_tpu.ops.cos_bermudan import (
    american_cos,
    bermudan_cos,
    gbm_model,
    merton_model,
    nig_model,
    vg_model,
)

S, K, T, R, SIG = 100.0, 110.0, 1.0, 0.10, 0.25
GBM = gbm_model(SIG, R, 0.0)


def _bs64(s, k, t, r, q, sig, is_call):
    """Host-f64 Black-Scholes (ops/bs.py runs f32 on the CPU test
    backend; the COS pins here are at 1e-8 and need full precision)."""
    d1 = (math.log(s / k) + (r - q + 0.5 * sig * sig) * t) \
        / (sig * math.sqrt(t))
    d2 = d1 - sig * math.sqrt(t)
    if is_call:
        return (s * math.exp(-q * t) * norm.cdf(d1)
                - k * math.exp(-r * t) * norm.cdf(d2))
    return (k * math.exp(-r * t) * norm.cdf(-d2)
            - s * math.exp(-q * t) * norm.cdf(-d1))


def test_single_date_bermudan_is_european():
    got = bermudan_cos(GBM, S, K, T, 1, is_call=False)["price"]
    ref = _bs64(S, K, T, R, 0.0, SIG, False)
    assert abs(got - ref) < 1e-8


def test_american_put_matches_crr():
    crr = binomial_american_bs(S, K, T, R, 0.0, SIG, steps=5000,
                               is_call=False)
    got = american_cos(GBM, S, K, T, is_call=False)["price"]
    # CRR at 5000 steps carries ~1e-3 of its own discretization error.
    assert abs(got - crr) < 2e-3


def test_american_call_no_dividends_is_european():
    got = american_cos(GBM, S, K, T, is_call=True)["price"]
    ref = _bs64(S, K, T, R, 0.0, SIG, True)
    assert abs(got - ref) < 1e-6
    # ... and the boundary reports no exercise region before maturity.
    berm = bermudan_cos(GBM, S, K, T, 16, is_call=True)
    assert all(np.isnan(x) for x in berm["boundary"][1:])


def test_dividend_call_matches_crr():
    m = gbm_model(0.2, 0.05, 0.08)
    crr = binomial_american_bs(100, 100, 1.0, 0.05, 0.08, 0.2,
                               steps=5000, is_call=True)
    out = american_cos(m, 100, 100, 1.0, is_call=True)
    assert abs(out["price"] - crr) < 2e-3
    # Early exercise is real here (q > r): premium over European.
    euro = _bs64(100, 100, 1.0, 0.05, 0.08, 0.2, True)
    assert out["price"] > euro + 0.1
    bnd = [x for x in out["boundary"] if np.isfinite(x)]
    assert all(x >= 100.0 for x in bnd)     # call boundary above K


def test_bermudan_ladder_monotone():
    prices = [bermudan_cos(GBM, S, K, T, m, is_call=False)["price"]
              for m in (1, 4, 16, 64)]
    assert all(b >= a - 1e-12 for a, b in zip(prices, prices[1:]))
    am = american_cos(GBM, S, K, T, is_call=False)
    assert am["price"] >= prices[-1] - 1e-9
    assert am["price"] >= K - S                  # >= intrinsic


def test_merton_european_matches_poisson_mixture_series():
    """Independent oracle: the classical Merton series — the European
    price is a Poisson mixture of BS prices with per-count vol and rate.
    Pins the increment CF, truncation, and payoff coefficients at once."""
    sig, lam, muj, sj, r = 0.2, 0.5, -0.1, 0.15, 0.05
    m = merton_model(sig, lam, muj, sj, r, 0.0)
    got = bermudan_cos(m, 100.0, 100.0, 0.5, 1, is_call=False)["price"]
    k_bar = math.exp(muj + 0.5 * sj * sj) - 1.0
    lam_p = lam * (1.0 + k_bar)
    ref = 0.0
    for n in range(60):
        sn = math.sqrt(sig * sig + n * sj * sj / 0.5)
        rn = r - lam * k_bar + n * math.log(1.0 + k_bar) / 0.5
        w = math.exp(-lam_p * 0.5) * (lam_p * 0.5) ** n / math.factorial(n)
        ref += w * _bs64(100.0, 100.0, 0.5, rn, 0.0, sn, False)
    assert abs(got - ref) < 1e-9


def test_merton_american_brackets_lsm():
    """American under JUMPS: the LSM engine run on the matching SVJ
    degenerate (xi=0, theta=v0 freezes the diffusion at sigma^2) must sit
    at-or-below the exact COS American within MC noise."""
    from mcos_tpu.engine.american import AmericanEngine
    from mcos_tpu.models.params import SVJParams

    sig, lam, muj, sj, r = 0.2, 0.5, -0.1, 0.15, 0.05
    m = merton_model(sig, lam, muj, sj, r, 0.0)
    exact = american_cos(m, 100.0, 100.0, 0.5, is_call=False)["price"]
    p = SVJParams(kappa=1.0, theta=sig * sig, xi=0.0, rho=0.0,
                  v0=sig * sig, lambda_j=lam, mu_j=muj, sigma_j=sj,
                  r=r, q=0.0)
    eng = AmericanEngine(p, num_paths=65536, num_steps=64, seed=7)
    lsm = eng.price(100.0, 100.0, 0.5, is_call=False)
    # Lower-bound estimator: below exact + noise; and not absurdly below
    # (64 exercise dates leaves only a small Bermudan gap).
    assert lsm["price"] <= exact + 3.0 * lsm["std_error"]
    assert lsm["price"] >= exact - 0.25 - 3.0 * lsm["std_error"]


def test_vg_nig_european_pins_and_american_order():
    from mcos_tpu.ops.levy import (NIGParams, VGParams, nig_cos_price,
                                   vg_cos_price)

    vp = VGParams(r=0.05, q=0.01)
    euro = bermudan_cos(vg_model(vp), 100, 105, 0.75, 1, is_call=False,
                        n_terms=512, L=14.0)["price"]
    ref = float(vg_cos_price(vp, 100, [105], 0.75, is_call=False)[0])
    assert abs(euro - ref) < 1e-10
    am = american_cos(vg_model(vp), 100, 105, 0.75, is_call=False,
                      n_terms=512, L=14.0)["price"]
    assert am > euro

    np_ = NIGParams(r=0.05, q=0.01)
    euro_n = bermudan_cos(nig_model(np_), 100, 105, 0.75, 1,
                          is_call=False, n_terms=512, L=14.0)["price"]
    ref_n = float(nig_cos_price(np_, 100, [105], 0.75, is_call=False)[0])
    assert abs(euro_n - ref_n) < 1e-10


def test_put_boundary_shape():
    """Put boundary: below K everywhere, rising toward K as t -> T."""
    out = bermudan_cos(GBM, S, K, T, 64, is_call=False)
    t = np.asarray(out["boundary_times"])    # T first, descending
    b = np.asarray(out["boundary"])
    assert np.all(b[1:] < K)
    order = np.argsort(t)                     # ascending time
    bt = b[order]
    # Monotone non-decreasing in t (allow tiny root-find wiggle).
    assert np.all(np.diff(bt) > -1e-3 * K)


def test_pde_cross_check_american_put():
    """Cross-engine: Crank-Nicolson American vs COS American, same GBM."""
    from mcos_tpu.engine.pde import PDEEngine

    pde = PDEEngine(sigma=SIG, r=R, q=0.0, n_x=801, n_t=256)
    p_pde = pde.price(S, K, T, is_call=False, american=True)["price"]
    p_cos = american_cos(GBM, S, K, T, is_call=False)["price"]
    assert abs(p_pde - p_cos) < 0.02


def test_api_american_cos_oracle():
    from mcos_tpu.api import server as api

    out = api.handle_american({
        "spot": 100.0, "strike": 110.0, "T": 1.0, "is_call": False,
        "num_paths": 16384,
        "params": {"kappa": 1.0, "theta": 0.0625, "xi": 0.0, "rho": 0.0,
                   "v0": 0.0625, "lambda_j": 0.0, "mu_j": 0.0,
                   "sigma_j": 0.1, "r": 0.10, "q": 0.0},
        "with_cos_oracle": True})
    oracle = out["cos_oracle"]
    crr = binomial_american_bs(100.0, 110.0, 1.0, 0.10, 0.0, 0.25,
                               steps=5000, is_call=False)
    assert abs(oracle["price"] - crr) < 2e-3
    assert "note" in oracle and "boundary" in oracle
    # LSM price consistent with its own oracle within noise + gap.
    assert out["price"] <= oracle["price"] + 3.0 * out["std_error"]
