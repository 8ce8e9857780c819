"""Request coalescing (api/coalesce.py): parity with the solo path and
actual batching behavior under concurrency.

The coalesced member program is the same estimator the solo serving path
runs (shared Sobol net, scan backend on CPU), so responses must agree to
float32 noise; the batcher itself must merge a concurrent window into ONE
device program.
"""

import threading

import numpy as np
import pytest

from mcos_tpu.api import coalesce, server
from mcos_tpu.api.server import ApiError


BODY = {
    "spot": 22500.0, "strike": 22500.0, "T": 1.0,
    "num_paths": 20_000, "num_steps": 16,
}


@pytest.fixture
def fresh_coalescer():
    """Reset the global coalescer + executable cache around each test."""
    saved = coalesce.coalescer.window_s
    coalesce._batched_fn.cache_clear()
    coalesce.coalescer = coalesce.PriceCoalescer(window_s=0.0)
    yield coalesce.coalescer
    coalesce.coalescer = coalesce.PriceCoalescer(window_s=saved)


def test_bucket_key_shapes_and_bypass():
    r = server.schemas.PriceRequest(**BODY)
    k1 = coalesce.bucket_key(r)
    assert k1 is not None and k1[0] == 20_000
    r2 = server.schemas.PriceRequest(**{**BODY, "T": 0.04})
    assert coalesce.bucket_key(r2) != k1          # different step shape
    r3 = server.schemas.PriceRequest(**{**BODY, "use_importance": True})
    assert coalesce.bucket_key(r3) is None        # multi-program host logic
    r4 = server.schemas.PriceRequest(**{**BODY, "rqmc_randomizations": 4})
    assert coalesce.bucket_key(r4) is None


def test_coalesced_matches_solo(fresh_coalescer):
    solo = server.handle_price(dict(BODY))        # window 0 → solo path
    fresh_coalescer.window_s = 0.01
    merged = server.handle_price(dict(BODY))
    assert merged["price"] == pytest.approx(solo["price"], rel=2e-4)
    assert merged["std_error"] == pytest.approx(solo["std_error"], rel=2e-3)
    from mcos_tpu.utils.fastjson import to_list

    m_paths = np.asarray(to_list(merged["sample_paths"]))
    s_paths = np.asarray(to_list(solo["sample_paths"]))
    assert m_paths.shape == s_paths.shape
    assert len(to_list(merged["terminal_samples"])) \
        == len(to_list(solo["terminal_samples"]))
    # Same viz seed + same recorder → the drawn paths agree too.
    assert np.allclose(m_paths, s_paths, rtol=1e-3)
    assert merged["post_checks"]["pass"]
    assert fresh_coalescer.batches_run == 1


def test_concurrent_window_is_one_batch(fresh_coalescer):
    fresh_coalescer.window_s = 0.30               # wide window → all merge
    coalesce._batched_fn.cache_clear()
    strikes = [21000.0, 22000.0, 23000.0, 24000.0]
    out, errs = {}, []

    def worker(k):
        try:
            out[k] = server.handle_price({**BODY, "strike": k})
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(k,)) for k in strikes]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert fresh_coalescer.batches_run == 1
    assert fresh_coalescer.requests_coalesced == 4
    ci = coalesce._batched_fn.cache_info()
    assert ci.misses == 1                          # ONE compiled executable
    prices = [out[k]["price"] for k in strikes]
    assert all(np.isfinite(prices))
    assert prices == sorted(prices, reverse=True)  # calls decrease in strike


def test_greeks_chain_rejects_with_cross():
    with pytest.raises(ApiError) as ei:
        server.handle_greeks({
            "spot": 22500.0, "T": 0.25, "strikes": [22000.0, 23000.0],
            "with_cross": True, "num_paths": 4096,
        })
    assert ei.value.status == 400
