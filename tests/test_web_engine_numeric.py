"""Numerical pin for the browser fallback engine (web/engine.js).

The desk UI ships a client-side Monte Carlo fallback (`web/engine.js
localMC`) and a closed-form BS helper (`web/app.js localBS`) so the desk
keeps working when the API is unreachable — the role of the reference's
Gen-1 browser engine (js/engine.js:42-95 GBM MC, :195-214 convergence,
:250-263 estimator contract). `tests/test_web_assets.py` checks the JS
structurally; this module pins it NUMERICALLY, with no JS runtime in the
image, in three layers:

1. A bit-exact Python twin of the JS arithmetic (mulberry32, Box-Muller,
   antithetic GBM, prefix-mean convergence, Abramowitz-Stegun ncdf).
   Every float op below is IEEE binary64, same as a JS `number`, so the
   twin and the browser produce identical bit patterns up to libm's
   log/cos/exp rounding (≤1 ulp per call).
2. A regex layer asserting web/engine.js / web/app.js still contain the
   exact load-bearing constants and formulas the twin re-derives — if the
   JS drifts, the constants test fails even though we can't execute it.
3. Committed golden values from the twin (seed 42, the JS defaults), plus
   the estimator CONTRACT the server side promises: the local MC price
   sits within a few std_errors of the exact Black-Scholes price.

If any of these fail, web/engine.js and the Python engines no longer
agree on what the fallback computes.
"""

import math
import re
from pathlib import Path

import pytest

WEB = Path(__file__).resolve().parent.parent / "web"
ENGINE_JS = (WEB / "engine.js").read_text()
APP_JS = (WEB / "app.js").read_text()

_M32 = 0xFFFFFFFF


# ── layer 1: the Python twin ──────────────────────────────────────────────

def mulberry32(seed):
    """Bit-exact twin of engine.js:14-22 (uint32 arithmetic; JS's
    `| 0` / `Math.imul` / `>>>` all reduce to mod-2^32 ops here)."""
    a = seed & _M32

    def rand():
        nonlocal a
        a = (a + 0x6D2B79F5) & _M32
        t = ((a ^ (a >> 15)) * (a | 1)) & _M32
        t = ((t + (((t ^ (t >> 7)) * (t | 61)) & _M32)) ^ t) & _M32
        return ((t ^ (t >> 14)) + 0.5) / 4294967296

    return rand


def local_mc_price(spot, strike, T, r, q, sigma, is_call,
                   num_pairs=5000, steps=64, seed=42):
    """Twin of engine.js:27-76 (simulate + price): antithetic GBM pairs
    driven by one Box-Muller normal per step, per-pair payoff averaging,
    population-variance std_error — the exact estimator the browser runs."""
    rand = mulberry32(seed)
    dt = T / steps
    drift = (r - q - 0.5 * sigma * sigma) * dt
    vol = sigma * math.sqrt(dt)
    log_s0 = math.log(spot)
    pays = []
    for _ in range(num_pairs):
        log_a = log_s0
        log_b = log_s0
        for _ in range(steps):
            z = (math.sqrt(-2 * math.log(rand()))
                 * math.cos(2 * math.pi * rand()))
            log_a += drift + vol * z
            log_b += drift - vol * z
        ta, tb = math.exp(log_a), math.exp(log_b)
        if is_call:
            a, b = max(ta - strike, 0.0), max(tb - strike, 0.0)
        else:
            a, b = max(strike - ta, 0.0), max(strike - tb, 0.0)
        pays.append(0.5 * (a + b))
    n = num_pairs
    mean = sum(pays) / n
    varr = max(sum(p * p for p in pays) / n - mean * mean, 0.0)
    disc = math.exp(-r * T)
    return {
        "price": disc * mean,
        "std_error": disc * math.sqrt(varr / n),
        "pay": pays,
        "disc": disc,
    }


def local_convergence(pay, disc, checkpoints=12):
    """Twin of engine.js:80-98 — REAL prefix means (the reference Gen-2 UI
    faked this chart, js/app.js:415-420)."""
    n = len(pay)
    counts = []
    for k in range(checkpoints):
        c = round(max(n / 2 ** (checkpoints - 1 - k), 32))
        if not counts or c > counts[-1]:
            counts.append(c)
    s = s2 = 0.0
    idx = 0
    out = {"num_paths": [], "price": [], "std_error": []}
    for c in counts:
        while idx < c:
            s += pay[idx]
            s2 += pay[idx] * pay[idx]
            idx += 1
        mean = s / c
        varr = max(s2 / c - mean * mean, 0.0)
        out["num_paths"].append(c)
        out["price"].append(disc * mean)
        out["std_error"].append(disc * math.sqrt(varr / c))
    return out


def local_bs_ncdf(x):
    """Twin of app.js:219-225 — Abramowitz-Stegun 26.2.17 (|err| < 7.5e-8)."""
    t = 1 / (1 + 0.2316419 * abs(x))
    d = 0.3989422804014327 * math.exp(-x * x / 2)
    p = d * t * (0.31938153 + t * (-0.356563782 + t * (1.781477937
                + t * (-1.821255978 + t * 1.330274429))))
    return 1 - p if x >= 0 else p


def exact_bs(S, K, T, r, q, sigma, is_call):
    st = sigma * math.sqrt(T)
    d1 = (math.log(S / K) + (r - q + sigma * sigma / 2) * T) / st
    d2 = d1 - st
    dfq, dfr = math.exp(-q * T), math.exp(-r * T)
    ncdf = lambda x: 0.5 * (1 + math.erf(x / math.sqrt(2)))  # noqa: E731
    if is_call:
        return S * dfq * ncdf(d1) - K * dfr * ncdf(d2)
    return K * dfr * ncdf(-d2) - S * dfq * ncdf(-d1)


# ── layer 2: the JS constants the twin re-derives ─────────────────────────

# (pattern, which file, why it's load-bearing)
_JS_PINS = [
    (r"a \+ 0x6D2B79F5", "engine", "mulberry32 stream constant"),
    (r"Math\.imul\(a \^ \(a >>> 15\), 1 \| a\)", "engine", "mulberry32 mix 1"),
    (r"Math\.imul\(t \^ \(t >>> 7\), 61 \| t\)", "engine", "mulberry32 mix 2"),
    (r"\(t \^ \(t >>> 14\)\) >>> 0\) \+ 0\.5\) / 4294967296", "engine",
     "uniform in (0,1) — the +0.5 keeps log(u) finite"),
    (r"\(r - q - 0\.5 \* sigma \* sigma\) \* dt", "engine",
     "risk-neutral log-drift"),
    (r"Math\.sqrt\(-2 \* Math\.log\(rand\(\)\)\)", "engine", "Box-Muller R"),
    (r"Math\.cos\(2 \* Math\.PI \* rand\(\)\)", "engine", "Box-Muller angle"),
    (r"logB \+= drift - vol \* z", "engine", "antithetic twin leg"),
    (r"0\.5 \* \(a \+ b\)", "engine", "per-pair payoff average"),
    (r"numPairs = 5000, steps = 64", "engine", "default sample sizes"),
    (r"seed = 42", "engine", "deterministic default seed"),
    (r"Math\.sqrt\(varr / numPairs\)", "engine", "std_error of the mean"),
    (r"n / 2 \*\* \(checkpoints - 1 - k\), 32", "engine",
     "convergence checkpoint schedule"),
    (r"0\.2316419", "app", "A&S 26.2.17 t-scale"),
    (r"0\.3989422804014327", "app", "1/sqrt(2*pi)"),
    (r"0\.31938153", "app", "A&S b1"),
    (r"-0\.356563782", "app", "A&S b2"),
    (r"1\.781477937", "app", "A&S b3"),
    (r"-1\.821255978", "app", "A&S b4"),
    (r"1\.330274429", "app", "A&S b5"),
]


@pytest.mark.parametrize("pattern,where,why", _JS_PINS,
                         ids=[p[2].replace(" ", "-") for p in _JS_PINS])
def test_js_constant_pinned(pattern, where, why):
    src = ENGINE_JS if where == "engine" else APP_JS
    assert re.search(pattern, src), (
        f"web/{where}.js lost '{why}' ({pattern}) — the Python twin in this "
        "file no longer describes what the browser computes; update BOTH.")


def test_js_has_no_math_random():
    """The whole point of the rebuild vs reference js/engine.js: seeded,
    reproducible draws. Math.random() must never reappear."""
    assert "Math.random" not in ENGINE_JS
    assert "Math.random" not in APP_JS


# ── layer 3: golden values + the estimator contract ──────────────────────

def test_mulberry32_stream_golden():
    rand = mulberry32(42)
    got = [rand() for _ in range(6)]
    want = [0.601103752036579, 0.448290559113957, 0.8524657936068252,
            0.6697340415557846, 0.17481389886233956, 0.5265925423009321]
    assert got == want  # exact: integer + dyadic-rational arithmetic only


# NIFTY-shaped contract at the engine.js defaults (numPairs=5000, steps=64,
# seed=42). Values committed from the twin; rel tol 1e-12 absorbs libm
# log/cos ulp differences across hosts.
_GOLDEN = {
    (True,): (386.43718651866243, 4.0586099930024),
    (False,): (338.40576115532883, 3.715112871309258),
}


@pytest.mark.parametrize("is_call", [True, False], ids=["call", "put"])
def test_local_mc_price_golden(is_call):
    res = local_mc_price(22500.0, 22500.0, 0.04, 0.065, 0.012, 0.2, is_call)
    price, se = _GOLDEN[(is_call,)]
    assert res["price"] == pytest.approx(price, rel=1e-12)
    assert res["std_error"] == pytest.approx(se, rel=1e-12)


@pytest.mark.parametrize("is_call", [True, False], ids=["call", "put"])
def test_local_mc_within_bs_band(is_call):
    """The estimator contract the server promises (SKILL verify flow #1,
    mirroring reference verify.py:26-42): |MC - BS| within a few sigma.
    At seed 42 the twin measures 0.90 sigma (call) / 0.87 sigma (put)."""
    res = local_mc_price(22500.0, 22500.0, 0.04, 0.065, 0.012, 0.2, is_call)
    bs = exact_bs(22500.0, 22500.0, 0.04, 0.065, 0.012, 0.2, is_call)
    assert abs(res["price"] - bs) < 4 * res["std_error"]


def test_convergence_prefix_means():
    res = local_mc_price(22500.0, 22500.0, 0.04, 0.065, 0.012, 0.2, True)
    conv = local_convergence(res["pay"], res["disc"])
    # Doubling schedule floored at 32, deduplicated, ends at the full run.
    assert conv["num_paths"] == [32, 39, 78, 156, 312, 625, 1250, 2500, 5000]
    # The last checkpoint IS the headline estimator — same mean, same se.
    assert conv["price"][-1] == pytest.approx(res["price"], rel=1e-15)
    assert conv["std_error"][-1] == pytest.approx(res["std_error"], rel=1e-15)
    # Standard error shrinks ~1/sqrt(n) across the series (real convergence —
    # the reference UI faked this chart, js/app.js:415-420).
    assert conv["std_error"][-1] < conv["std_error"][0]


def test_local_bs_ncdf_abramowitz_accuracy():
    """A&S 26.2.17 promises |err| < 7.5e-8; sweep the range the desk uses."""
    worst = max(abs(local_bs_ncdf(x / 100) - 0.5 * (1 + math.erf(x / 100
                / math.sqrt(2)))) for x in range(-600, 601))
    assert worst < 7.5e-8


def test_local_bs_price_matches_exact():
    """app.js localBS.price (A&S ncdf) vs exact erf BS across the sweep grid
    the UI draws (vol 5-80%, strikes 0.7-1.3 spot): sub-cent on a 22500
    underlying, so the browser's sweep charts match the server's pricer."""
    S, T, r, q = 22500.0, 0.04, 0.065, 0.012

    def local_bs_price(S, K, T, r, q, sigma, is_call):
        st = sigma * math.sqrt(T)
        d1 = (math.log(S / K) + (r - q + sigma * sigma / 2) * T) / st
        d2 = d1 - st
        dfq, dfr = math.exp(-q * T), math.exp(-r * T)
        if is_call:
            return S * dfq * local_bs_ncdf(d1) - K * dfr * local_bs_ncdf(d2)
        return K * dfr * local_bs_ncdf(-d2) - S * dfq * local_bs_ncdf(-d1)

    for sigma in (0.05, 0.2, 0.5, 0.8):
        for m in (0.7, 0.9, 1.0, 1.1, 1.3):
            for is_call in (True, False):
                got = local_bs_price(S, S * m, T, r, q, sigma, is_call)
                want = exact_bs(S, S * m, T, r, q, sigma, is_call)
                assert abs(got - want) < 0.01
