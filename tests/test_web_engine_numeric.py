"""Numerical pin for the browser fallback engine (web/engine.js).

No JS runtime exists in this image, so the pin is a three-legged contract
(VERDICT r3 item 7):

1. `_js_twin_price` re-derives web/engine.js's `localMC.price` arithmetic
   in Python, EXACTLY: the mulberry32 stream (int32/uint32 semantics mod
   2^32), one-normal-per-step Box-Muller, antithetic log-mirrored GBM,
   per-pair payoff averaging, and the biased-variance stderr.
2. A regex layer asserts web/engine.js still contains every load-bearing
   constant and estimator line the twin mirrors — any drift in the JS
   math breaks this file or the golden value below.
3. A committed golden value pins the twin itself (and documents the
   number a future headless-browser drive must reproduce bit-for-bit).

Plus the estimator contract: the local engine's price must sit inside its
own confidence band around closed-form Black-Scholes — the same oracle the
server estimator is pinned to (reference js/engine.js:250-263 semantics).
"""

import math
import re
from pathlib import Path

import numpy as np

from mcos_tpu.ops.bs import bs_price

ENGINE_JS = Path(__file__).resolve().parents[1] / "web" / "engine.js"

_M = 0xFFFFFFFF


def _mulberry32(seed: int):
    """Bit-exact Python port of web/engine.js:rng (mulberry32)."""
    a = seed & _M

    def rand() -> float:
        nonlocal a
        a = (a + 0x6D2B79F5) & _M
        t = ((a ^ (a >> 15)) * (a | 1)) & _M
        t = ((t + (((t ^ (t >> 7)) * ((t | 61) & _M)) & _M)) & _M) ^ t
        t &= _M
        return ((t ^ (t >> 14)) + 0.5) / 4294967296.0

    return rand


def _js_twin_price(spot, strike, T, r, q, sigma, is_call,
                   num_pairs=5000, steps=64, seed=42):
    """localMC.price re-derived line-for-line (float64 throughout)."""
    rand = _mulberry32(seed)
    dt = T / steps
    drift = (r - q - 0.5 * sigma * sigma) * dt
    vol = sigma * math.sqrt(dt)
    log_spot = math.log(spot)
    pay = np.empty(num_pairs)
    for i in range(num_pairs):
        log_a = log_b = log_spot
        for _ in range(steps):
            z = math.sqrt(-2.0 * math.log(rand())) * math.cos(
                2.0 * math.pi * rand())
            log_a += drift + vol * z
            log_b += drift - vol * z
        sa, sb = math.exp(log_a), math.exp(log_b)
        if is_call:
            pa, pb = max(sa - strike, 0.0), max(sb - strike, 0.0)
        else:
            pa, pb = max(strike - sa, 0.0), max(strike - sb, 0.0)
        pay[i] = 0.5 * (pa + pb)
    disc = math.exp(-r * T)
    mean = pay.sum() / num_pairs
    varr = max((pay * pay).sum() / num_pairs - mean * mean, 0.0)
    return disc * mean, disc * math.sqrt(varr / num_pairs)


def test_engine_js_constants_still_match_twin():
    """Every constant/line the Python twin mirrors must survive in the JS
    verbatim (this is what converts the twin into a drift detector)."""
    src = ENGINE_JS.read_text()
    for pattern in [
        r"0x6D2B79F5",                        # mulberry32 increment
        r"a \^ \(a >>> 15\)",                 # first mix
        r"61 \| t",                           # second mix multiplier
        r"t \^ \(t >>> 14\)",                 # output mix
        r"\+ 0\.5\) / 4294967296",            # half-ulp uniform
        r"Math\.sqrt\(-2 \* Math\.log\(rand\(\)\)\)",  # Box-Muller radius
        r"Math\.cos\(2 \* Math\.PI \* rand\(\)\)",     # Box-Muller angle
        r"logB \+= drift - vol \* z",         # antithetic twin
        r"0\.5 \* \(a \+ b\)",                # per-pair payoff average
        r"sumSq / numPairs - mean \* mean",   # biased variance
        r"Math\.sqrt\(varr / numPairs\)",     # stderr of the pair mean
    ]:
        assert re.search(pattern, src), f"engine.js drifted: /{pattern}/"


def test_twin_matches_committed_golden_value():
    """Golden fixture: the canonical config's exact price. Recompute only
    if the ALGORITHM intentionally changes (then update web/engine.js,
    this value, and the headless-drive expectations together)."""
    price, se = _js_twin_price(22500.0, 22500.0, 0.04, 0.065, 0.012, 0.2,
                               True, num_pairs=2000, steps=32, seed=42)
    assert abs(price - 385.72464481166367) < 1e-6
    assert abs(se - 6.413105392556932) < 1e-8


def test_twin_price_within_band_of_black_scholes():
    """The estimator contract the server engine is held to, applied to the
    browser fallback's exact arithmetic (reference js/engine.js:250-263)."""
    for is_call in (True, False):
        price, se = _js_twin_price(22500.0, 22500.0, 0.04, 0.065, 0.012,
                                   0.2, is_call, num_pairs=4000, steps=32)
        exact = float(bs_price(22500.0, 22500.0, 0.04, 0.065, 0.012, 0.2,
                               is_call))
        assert abs(price - exact) < 4 * se + 1e-9


def test_twin_antithetic_mirror_and_determinism():
    p1 = _js_twin_price(100.0, 100.0, 0.5, 0.05, 0.0, 0.3, True,
                        num_pairs=500, steps=16, seed=7)
    p2 = _js_twin_price(100.0, 100.0, 0.5, 0.05, 0.0, 0.3, True,
                        num_pairs=500, steps=16, seed=7)
    assert p1 == p2                       # seeded determinism, like the JS
    p3 = _js_twin_price(100.0, 100.0, 0.5, 0.05, 0.0, 0.3, True,
                        num_pairs=500, steps=16, seed=8)
    assert p1 != p3
