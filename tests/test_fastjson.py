"""Native JSON float-array serializer (utils/fastjson.py + native/fastjson.cpp).

Parsed-value equivalence between the native path and the numpy fallback is
the contract — formatting may differ ("1.50" vs "1.5"), values may not.
"""

import json
import math

import numpy as np
import pytest

from mcos_tpu.utils import fastjson as fj


def _native_available():
    return fj._get_lib() is not None


def test_array_roundtrip_matches_rounding():
    arr = np.array([0.0, 1.0, -1.0, 1.2345, -9.8765, 123456.789,
                    0.004, -0.004, 22500.126])
    parsed = json.loads(fj.float_array_json(arr, 2).raw)
    np.testing.assert_allclose(parsed, np.round(arr, 2), atol=5.1e-3)


def test_matrix_roundtrip():
    m = np.random.default_rng(0).lognormal(10, 0.05, (50, 64))
    parsed = np.asarray(json.loads(fj.float_array_json(m, 2).raw))
    assert parsed.shape == m.shape
    np.testing.assert_allclose(parsed, np.round(m, 2), atol=5.1e-3)


def test_nonfinite_encode_as_null():
    arr = np.array([1.0, np.nan, np.inf, -np.inf, 2.0])
    parsed = json.loads(fj.float_array_json(arr, 2).raw)
    assert parsed == [1.0, None, None, None, 2.0]


def test_huge_values_stay_exactish():
    arr = np.array([1e20, -3.7e18, 9.007e15])
    parsed = json.loads(fj.float_array_json(arr, 2).raw)
    np.testing.assert_allclose(parsed, arr, rtol=1e-12)


def test_decimals_zero_and_high():
    arr = np.array([1.6, -2.4, 0.49])
    assert json.loads(fj.float_array_json(arr, 0).raw) == [2.0, -2.0, 0.0]
    p = json.loads(fj.float_array_json(np.array([math.pi]), 9).raw)[0]
    assert p == pytest.approx(math.pi, abs=1e-9)


def test_dumps_splices_chunks():
    m = np.array([[1.25, 2.5], [3.75, -0.128]])
    body = {"a": fj.float_array_json(m, 2), "b": 1,
            "nested": {"c": fj.float_array_json(np.array([9.99]), 1)}}
    out = json.loads(fj.dumps(body))
    assert out["b"] == 1
    np.testing.assert_allclose(out["a"], [[1.25, 2.5], [3.75, -0.13]],
                               atol=5.1e-3)
    assert out["nested"]["c"] == [10.0]
    # No placeholder artifacts survive.
    assert "mcos-json-chunk" not in fj.dumps(body)


def test_dumps_plain_passthrough():
    assert fj.dumps({"x": [1, 2], "y": "s"}) == json.dumps({"x": [1, 2],
                                                            "y": "s"})
    with pytest.raises(TypeError):
        fj.dumps({"bad": object()})


def test_to_list_unwraps():
    c = fj.float_array_json(np.array([1.5, 2.5]), 1)
    assert fj.to_list(c) == [1.5, 2.5]
    assert fj.to_list([3, 4]) == [3, 4]


@pytest.mark.skipif(not _native_available(),
                    reason="no C++ toolchain for the native serializer")
def test_native_and_fallback_agree():
    rng = np.random.default_rng(7)
    arr = np.concatenate([rng.lognormal(10, 0.3, 500),
                          -rng.lognormal(2, 1.0, 500),
                          np.array([np.nan, np.inf])])
    native = json.loads(fj.float_array_json(arr, 2).raw)
    fallback = json.loads(fj._fallback_json(arr, 2))
    # Both encoders round half-AWAY-from-zero on the scaled value, so
    # parsed values are identical — including exact-half ties.
    assert native == fallback


def test_fallback_rounds_half_away_from_zero():
    """Exact-half ties must match the native llround (half away from
    zero), not np.round's banker's rounding: 0.125 @ 2 → 0.13, not 0.12."""
    arr = np.array([0.125, -0.125, 0.135, -0.135, 2.5, -2.5])
    got = json.loads(fj._fallback_json(arr, 2))
    assert got == [0.13, -0.13, 0.14, -0.14, 2.5, -2.5]
    got0 = json.loads(fj._fallback_json(np.array([2.5, -2.5, 3.5]), 0))
    assert got0 == [3.0, -3.0, 4.0]


def test_price_handler_payload_is_valid_json():
    from mcos_tpu.api.server import handle_price

    body = {"spot": 100.0, "strike": 100.0, "T": 0.1, "num_paths": 20_000,
            "params": {"v0": 0.04, "theta": 0.04, "xi": 1e-4, "kappa": 1.0,
                       "rho": 0.0, "lambda_j": 0.0, "r": 0.06, "q": 0.0}}
    out = handle_price(body)
    s = fj.dumps(out)
    parsed = json.loads(s)
    paths = np.asarray(parsed["sample_paths"])
    assert paths.shape[0] == 50 and paths.shape[1] > 10
    assert np.all(paths > 0)
    assert len(parsed["terminal_samples"]) >= 1024
