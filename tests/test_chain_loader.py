"""Native C++ chain loader vs the Python fallback: identical outputs, dirty
rows skipped, liquidity screen applied, calibration-slice extraction."""

import os
import textwrap

import numpy as np
import pytest

from mcos_tpu.utils import chain_loader

CSV = textwrap.dedent("""\
    expiry_years,strike,is_call,bid,ask,open_interest
    0.04,22000,CE,510.0,514.0,5000
    0.04,22500,CE,195.5,197.0,12000
    0.04,23000,CE,48.2,49.0,8000
    0.04,22500,PE,180.0,182.0,9000
    0.04,24000,CE,2.0,6.0,50
    garbage,row,that,should,be,skipped
    0.25,22500,1,560.0,564.0,3000
    0.25,23000,0,700.0,900.0,2000
""")


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "chain.csv"
    p.write_text(CSV)
    return str(p)


def test_python_fallback_parses(csv_path):
    chain = chain_loader.load_chain(csv_path, force_python=True)
    assert chain["strike"].shape == (7,)  # garbage row skipped
    assert chain["is_call"].sum() == 5  # CE/1 rows
    # OI=50 row fails min_oi=100; 700/900 row fails the 10% spread screen.
    assert chain["liquid"].sum() == 5
    assert not chain["liquid"][4]
    assert not chain["liquid"][6]
    np.testing.assert_allclose(chain["mid"][1], 196.25)


def test_native_matches_python(csv_path):
    native = chain_loader.load_chain(csv_path)
    python = chain_loader.load_chain(csv_path, force_python=True)
    if chain_loader._get_lib() is None:
        pytest.skip("no C++ toolchain in this environment")
    for key in ("expiry", "strike", "is_call", "bid", "ask",
                "open_interest", "mid"):
        np.testing.assert_allclose(native[key], python[key], rtol=1e-12)
    np.testing.assert_array_equal(native["liquid"], python["liquid"])


def test_calibration_slice(csv_path):
    chain = chain_loader.load_chain(csv_path, force_python=True)
    inputs = chain_loader.chain_to_calibration_inputs(chain, 0.04)
    # Liquid calls at T=0.04: strikes 22000/22500/23000, sorted.
    np.testing.assert_allclose(inputs["strikes"], [22000, 22500, 23000])
    assert inputs["market_prices"][0] == pytest.approx(512.0)
    assert (inputs["bid_ask_spreads"] > 0).all()


def test_native_large_file_roundtrip(tmp_path):
    if chain_loader._get_lib() is None:
        pytest.skip("no C++ toolchain in this environment")
    rng = np.random.default_rng(0)
    n = 50_000
    strikes = rng.uniform(15000, 30000, n).round(1)
    bids = rng.uniform(1, 500, n).round(2)
    rows = "\n".join(
        f"0.1,{k},{'CE' if i % 2 else 'PE'},{b},{b * 1.02:.2f},{100 + i}"
        for i, (k, b) in enumerate(zip(strikes, bids)))
    p = tmp_path / "big.csv"
    p.write_text("expiry_years,strike,is_call,bid,ask,open_interest\n" + rows)
    chain = chain_loader.load_chain(str(p))
    assert chain["strike"].shape == (n,)
    np.testing.assert_allclose(np.sort(chain["strike"]), np.sort(strikes),
                               rtol=1e-9)
    assert chain["liquid"].all()  # 2% spreads, OI ≥ 100


def test_missing_file_raises():
    with pytest.raises((FileNotFoundError, IOError)):
        chain_loader.load_chain("/nonexistent/chain.csv", force_python=True)
