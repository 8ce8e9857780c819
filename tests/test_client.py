"""McosClient (api/client.py) driven over a real socket."""

import threading

import numpy as np
import pytest

from mcos_tpu.api import server as api_server
from mcos_tpu.api.client import ApiClientError, McosClient


@pytest.fixture(scope="module")
def client():
    httpd = api_server.serve(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield McosClient(f"http://127.0.0.1:{port}")
    httpd.shutdown()


def test_health_and_metrics(client):
    assert client.health()["status"] == "healthy"
    snap = client.metrics()
    assert "endpoints" in snap and "coalescer" in snap


def test_price_and_greeks_roundtrip(client):
    res = client.price(spot=22500.0, strike=22500.0, T=0.5,
                       num_paths=20_000, num_steps=16)
    assert res["price"] > 0 and np.isfinite(res["std_error"])
    g = client.greeks(spot=22500.0, strike=22500.0, T=0.5, num_paths=8192)
    assert 0.0 < g["delta"]["pathwise"] < 1.0


def test_extra_fields_pass_through(client):
    res = client.price(spot=22500.0, strike=26000.0, T=0.1,
                       num_paths=20_000, num_steps=16, use_importance=True)
    assert "ess" in res  # importance-sampling diagnostic made the trip


def test_error_mapping(client):
    with pytest.raises(ApiClientError) as ei:
        client.greeks(spot=22500.0, T=0.25, strikes=[22000.0, 23000.0],
                      with_cross=True, num_paths=4096)
    assert ei.value.status == 400
    with pytest.raises(ApiClientError) as ei:
        client.price(spot=22500.0, strike=22500.0)  # missing T → 422
    assert ei.value.status == 422


def test_quote_offline_fallback(client):
    q = client.quote("RELIANCE")
    assert q["price"] > 0 and q["source"] in ("LIVE", "CACHED")
    syms = client.symbols("bank")
    assert any("BANK" in s["symbol"].upper() for s in syms["symbols"])


def test_client_covers_every_post_route():
    """Drift net: one client method per POST endpoint (the sweep's analogue
    for the client surface)."""
    from mcos_tpu.api import server as api
    from mcos_tpu.api.client import McosClient

    for route in api.POST_ROUTES:
        method = route.rsplit("/", 1)[-1]
        assert callable(getattr(McosClient, method, None)), \
            f"client is missing .{method}() for {route}"
