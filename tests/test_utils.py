"""Utils: timing harness, checkpoint round-trip, quote fallback."""

import numpy as np
import pytest

from mcos_tpu.api.quotes import (
    fetch_quote,
    get_fallback_price,
    get_stock_by_symbol,
    realized_vol_from_closes,
)
from mcos_tpu.models.params import SVJParams
from mcos_tpu.utils.checkpoint import load_calibration, save_calibration
from mcos_tpu.utils.timing import benchmark, timed_call


def test_timed_call_sync():
    import jax.numpy as jnp

    out, ms = timed_call(lambda: jnp.ones((64, 64)).sum())
    assert float(out) == 64 * 64
    assert ms > 0


def test_benchmark_stats():
    stats = benchmark(lambda: sum(range(1000)), warmup=1, trials=3)
    assert stats["min_ms"] <= stats["median_ms"] <= stats["mean_ms"] * 1.5
    assert stats["trials"] == 3


def test_checkpoint_roundtrip(tmp_path):
    p = SVJParams(kappa=4.2, theta=0.05, xi=0.33, rho=-0.55, v0=0.041,
                  lambda_j=1.7, mu_j=-0.06, sigma_j=0.12)
    history = [{"stage1_error": 1.5, "params": [1, 2, 3]}]
    d = save_calibration(str(tmp_path / "ckpt"), p, history,
                         metadata={"regime": "event"})
    p2, h2, meta = load_calibration(d)
    for field in ("kappa", "theta", "xi", "rho", "v0",
                  "lambda_j", "mu_j", "sigma_j"):
        assert float(getattr(p2, field)) == pytest.approx(
            float(getattr(p, field)), rel=1e-6)
    assert h2 == history
    assert meta["regime"] == "event"


def test_quote_fallback_offline():
    q = fetch_quote("TCS")
    assert q is not None
    assert q["source"] in ("CACHED", "LIVE")
    assert q["price"] > 0
    assert fetch_quote("ZZZNOTREAL") is None


def test_stock_universe():
    info = get_stock_by_symbol("reliance")
    assert info is not None and info["sector"] == "Energy"
    assert get_fallback_price("TCS") > 0
    assert get_fallback_price("ZZZ") is None


def test_realized_vol_from_closes():
    rng = np.random.default_rng(0)
    closes = list(100 * np.exp(np.cumsum(rng.normal(0, 0.01, 250))))
    rv = realized_vol_from_closes(closes)
    assert rv == pytest.approx(0.01 * np.sqrt(245), rel=0.2)
    assert np.isnan(realized_vol_from_closes([100.0]))
