"""Market-quote Greeks (IFT through the calibration): the replication
identity, the recalibration finite-difference oracle, surface buckets,
and the API handler."""

import numpy as np
import pytest

from mcos_tpu.engine.quotegreeks import (
    CORE4,
    chain_jacobian,
    product_price_and_gradient,
    quote_bucket_greeks,
    quote_transfer_matrix,
)
from mcos_tpu.models.params import SVJParams
from mcos_tpu.ops.cos_pricer import cos_price

S, T = 22500.0, 0.25
P = SVJParams()
KS4 = np.array([0.88, 0.96, 1.04, 1.12]) * S


def test_replication_identity_square_system():
    """Product = chain quote k with an exactly identified square system:
    buckets must be the k-th unit vector (repricing quote k moves the
    product one-for-one, the others not at all)."""
    for k_idx in (0, 1, 3):
        out = quote_bucket_greeks(
            P, S, KS4, T,
            {"kind": "vanilla", "strike": float(KS4[k_idx]), "T": T})
        assert out["identified"], out["condition_number"]
        expect = np.eye(4)[k_idx]
        np.testing.assert_allclose(out["buckets"], expect, atol=5e-3)


def test_recalibration_fd_oracle():
    """THE oracle: bump one quote, REFIT (weighted least squares on the
    same exact COS objective, same free set, same weights), reprice an
    off-chain vanilla — the bucket must predict that finite difference."""
    from scipy.optimize import least_squares

    product_K = 1.07 * S
    out = quote_bucket_greeks(
        P, S, KS4, T, {"kind": "vanilla", "strike": product_K, "T": T})
    w = quote_transfer_matrix(P, S, KS4, T)["weights"]
    base_q = np.asarray(cos_price(P, S, KS4, T, True))
    x_true = np.array([float(getattr(P, n)) for n in CORE4])

    def refit_price(q):
        def resid(x):
            p = P.replace(**dict(zip(CORE4, x)))
            return np.sqrt(w) * (np.asarray(cos_price(p, S, KS4, T, True))
                                 - q)
        res = least_squares(resid, x_true, xtol=1e-14, ftol=1e-14,
                            gtol=1e-14)
        p = P.replace(**dict(zip(CORE4, res.x)))
        return float(cos_price(p, S, [product_K], T, True)[0])

    for k_idx in (1, 2):
        eps = 2.0       # rupees on a ~1000-3000 rupee quote
        bump = np.zeros(4)
        bump[k_idx] = eps
        fd = (refit_price(base_q + bump) - refit_price(base_q - bump)) \
            / (2.0 * eps)
        assert abs(fd - out["buckets"][k_idx]) < 0.03, (
            k_idx, fd, out["buckets"][k_idx])


def test_underdetermined_falls_back_to_pseudo_inverse():
    """More free params than one expiry identifies: flagged, and the
    buckets still reproduce a consistent model move (q shift generated
    by a parameter move maps back to that move's price change)."""
    free = ("kappa", "theta", "xi", "rho", "v0")
    out = quote_bucket_greeks(
        P, S, KS4, T, {"kind": "vanilla", "strike": 1.07 * S, "T": T},
        free=free)
    assert not out["identified"]
    assert np.all(np.isfinite(out["buckets"]))


def test_surface_buckets_identify_kappa():
    """Two expiries carry term-structure information: the 5-param Heston
    core becomes identified and buckets split across the maturities."""
    strikes = [KS4, np.array([0.9, 1.0, 1.1, 1.2]) * S]
    Ts = [0.1, 0.75]
    free = ("kappa", "theta", "xi", "rho", "v0")
    out = quote_bucket_greeks(
        P, S, strikes, Ts, {"kind": "vanilla", "strike": S, "T": 0.4},
        free=free)
    assert len(out["buckets"]) == 8
    assert len(set(out["maturities"])) == 2
    assert out["condition_number"] < 1e10
    # A T=0.4 product must load on BOTH expiries' quotes.
    b = np.abs(np.asarray(out["buckets"]))
    assert b[:4].max() > 1e-3 and b[4:].max() > 1e-3


def test_digital_and_varswap_products():
    dig = quote_bucket_greeks(
        P, S, KS4, T, {"kind": "digital", "strike": S, "T": T})
    assert 0.0 < dig["product_price"] < np.exp(-float(P.r) * T)
    vs = quote_bucket_greeks(
        P, S, KS4, T, {"kind": "varswap", "T": T, "notional": 1e4})
    # Fair variance near theta-v0 scale x notional.
    assert 300.0 < vs["product_price"] < 900.0
    assert np.all(np.isfinite(vs["buckets"]))
    # Digital put parity: digital_call + digital_put = e^{-rT}.
    dig_put = product_price_and_gradient(
        P, S, {"kind": "digital", "strike": S, "T": T, "is_call": False})
    assert abs(dig["product_price"] + dig_put[0]
               - np.exp(-float(P.r) * T)) < 1e-6


def test_jacobian_matches_single_param_fd():
    J = chain_jacobian(P, S, KS4, T, free=("v0",))
    h = 1e-3 * float(P.v0)
    up = np.asarray(cos_price(P.replace(v0=P.v0 + h), S, KS4, T, True))
    dn = np.asarray(cos_price(P.replace(v0=P.v0 - h), S, KS4, T, True))
    np.testing.assert_allclose(J[:, 0], (up - dn) / (2 * h), rtol=1e-3)


def test_bad_product_kind_raises():
    with pytest.raises(ValueError):
        product_price_and_gradient(P, S, {"kind": "nope", "T": T})


def test_api_quotegreeks():
    from mcos_tpu.api import server as api

    base = {"spot": S, "T": T, "strikes": list(map(float, KS4)),
            "product": {"kind": "vanilla", "strike": 1.07 * S, "T": T}}
    out = api.handle_quotegreeks(dict(base))
    assert len(out["buckets"]) == 4 and out["identified"]
    assert "hedge" in out and out["hedge"][0]["position"] is not None
    # Surface form.
    out2 = api.handle_quotegreeks({
        "spot": S, "T": [0.1, 0.75],
        "strikes": [list(map(float, KS4)),
                    [0.9 * S, 1.0 * S, 1.1 * S, 1.2 * S]],
        "free": ["kappa", "theta", "xi", "rho", "v0"],
        "product": {"kind": "vanilla", "strike": S, "T": 0.4}})
    assert len(out2["buckets"]) == 8
    with pytest.raises(api.ApiError):
        api.handle_quotegreeks({**base, "product": {"kind": "nope",
                                                    "T": T}})
