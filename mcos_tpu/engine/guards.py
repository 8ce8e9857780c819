"""Production stability guards: pre-price and post-price validation.

TPU-native re-design of the reference's guard layer (reference:
engine/guards.py). Same contract: `check_pre_price` rejects unreliable
parameterizations before any compute, `check_post_price` sanity-checks the MC
result, `validate_simulation_output` screens terminal arrays.

Host-side by design — these are request-admission checks on a handful of
scalars; the expensive parts (NaN/Inf scans over terminal arrays) are already
computed *on device* inside the pricer as fused reductions
(`frac_nonfinite`, `v_max` in mc_price_core) so the guard only inspects
scalars and never pulls path arrays to the host.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from mcos_tpu.config import (
    JUMP_COMPENSATION_TOL,
    MAX_CORRELATION,
    MAX_VARIANCE,
    SAFE_STRIKE_RANGE,
    VOL_OF_VOL_ALERT_THRESHOLD,
)
from mcos_tpu.models.params import SVJParams

logger = logging.getLogger("mcos_tpu.guards")


class PricingGuard:
    """Pre/post pricing validation (guards.py:28-170 API).

    check_pre_price → {'pass': bool, 'failures': [...], 'alerts': [...]}
    check_post_price → same shape, applied to the pricer's result dict.
    """

    def __init__(self, params: SVJParams):
        self.params = params
        self.alerts: list = []

    def check_pre_price(self, spot: float, strike: float, T: float) -> Dict:
        """Parameter/domain admission checks (guards.py:41-115 rule set)."""
        failures = []
        alerts = []
        p = self.params
        v0, theta, xi = float(p.v0), float(p.theta), float(p.xi)
        rho = float(p.rho)

        # Variance sanity.
        if v0 > MAX_VARIANCE:
            failures.append(f"v0={v0:.4f} exceeds MAX_VARIANCE={MAX_VARIANCE}")
        if v0 <= 0:
            failures.append(f"v0={v0:.6f} is non-positive")
        if theta > MAX_VARIANCE:
            failures.append(f"θ={theta:.4f} exceeds MAX_VARIANCE={MAX_VARIANCE}")
        if theta <= 0:
            failures.append(f"θ={theta:.6f} is non-positive")

        # Correlation bound.
        if abs(rho) > MAX_CORRELATION:
            failures.append(f"|ρ|={abs(rho):.4f} exceeds {MAX_CORRELATION}")

        # Jump-compensation self-consistency (guards.py:67-73: the engine's k
        # must match exp(μ+σ²/2)−1; a mismatch means corrupted params).
        # Both sides evaluated in f64 on host: comparing the device-f32
        # jnp.exp against host np.exp falsely fails the 1e-6 tolerance on TPU
        # (exp differs by ~2e-6 between the two) — found by the on-TPU drive.
        mu, sig = float(p.mu_j), float(p.sigma_j)
        if not (np.isfinite(mu) and np.isfinite(sig)):
            failures.append(
                f"Jump parameters non-finite: μ_J={mu}, σ_J={sig}")
        else:
            k = float(np.exp(mu + 0.5 * sig**2) - 1.0)
            device_k = float(p.jump_compensation)
            if abs(k - device_k) > max(JUMP_COMPENSATION_TOL,
                                       5e-6 * max(abs(k), 1.0)):
                failures.append(
                    f"Jump compensation misaligned: k={device_k:.6f} "
                    f"vs expected={k:.6f}")

        # Surface extrapolation alert.
        if spot > 0:
            m = strike / spot
            lo, hi = SAFE_STRIKE_RANGE
            if m < lo or m > hi:
                alerts.append(
                    f"Moneyness K/S={m:.3f} lies beyond the calibrated band "
                    f"[{lo}, {hi}] — treat the quote as extrapolated.")

        # Vol-of-vol spike alert.
        if xi > VOL_OF_VOL_ALERT_THRESHOLD:
            alerts.append(
                f"Vol-of-vol ξ={xi:.3f} above the "
                f"{VOL_OF_VOL_ALERT_THRESHOLD} alert line — expect noisy "
                "variance paths and wide stderr.")

        # Feller alert (soft — full truncation keeps the scheme stable).
        if not p.feller_satisfied:
            alerts.append(
                f"Feller check fails (2κθ={2 * float(p.kappa) * theta:.4f} "
                f"< ξ²={xi**2:.4f}): the variance process can touch zero, "
                "full truncation will clip it.")

        # Maturity domain.
        if T <= 0:
            failures.append(f"T={T} is non-positive")
        if T > 5:
            alerts.append(f"T={T:.2f}y maturity sits outside the weekly-"
                          "options regime this model is tuned for")

        self.alerts.extend(alerts)
        for f in failures:
            logger.error("PRE-PRICE FAILURE: %s", f)
        for a in alerts:
            logger.warning("PRE-PRICE ALERT: %s", a)
        return {"pass": not failures, "failures": failures, "alerts": alerts}

    def check_post_price(self, result: Dict, spot: float, strike: float,
                         T: float, is_call: bool = True) -> Dict:
        """Result sanity checks (guards.py:117-170 rule set)."""
        failures = []
        alerts = []
        price = result.get("price", 0.0)
        std_error = result.get("std_error", 0.0)
        r, q = float(self.params.r), float(self.params.q)

        if price < -1e-6:
            failures.append(f"Negative price={price:.6f}")

        # 0.1%-of-premium stderr tolerance (config.py:25 / guards.py:139-142).
        if price > 0 and std_error / price > 0.001:
            alerts.append(
                f"MC noise at {std_error / price:.4%} of premium — above the "
                "0.1% production tolerance; raise num_paths")

        # No-arbitrage ceilings.
        if is_call and price > spot * 1.01:
            failures.append(f"Call at {price:.2f} breaches its no-arbitrage "
                            f"ceiling (spot {spot:.2f})")
        if not is_call and price > strike * np.exp(-r * T) * 1.01:
            failures.append(f"Put at {price:.2f} breaches its no-arbitrage "
                            "ceiling (discounted strike)")

        # Intrinsic floor within 3σ.
        if is_call:
            intrinsic = max(spot * np.exp(-q * T) - strike * np.exp(-r * T), 0.0)
        else:
            intrinsic = max(strike * np.exp(-r * T) - spot * np.exp(-q * T), 0.0)
        if price < intrinsic - 3 * std_error:
            failures.append(
                f"Price {price:.4f} undershoots the intrinsic floor "
                f"{intrinsic:.4f} beyond 3σ of MC noise")

        # Device-side diagnostics surfaced by the pricer (replaces the
        # reference's host-side array scans when available).
        if result.get("frac_nonfinite", 0.0) > 0:
            failures.append(
                f"{result['frac_nonfinite']:.2e} fraction of non-finite "
                "terminal spots")
        if result.get("v_max", 0.0) > MAX_VARIANCE:
            alerts.append(
                f"Max terminal variance={result['v_max']:.4f} exceeds "
                f"limit={MAX_VARIANCE}")

        for f in failures:
            logger.error("POST-PRICE FAILURE: %s", f)
        for a in alerts:
            logger.warning("POST-PRICE ALERT: %s", a)
        return {"pass": not failures, "failures": failures, "alerts": alerts}


def validate_simulation_output(s_final, v_final) -> Dict:
    """Terminal-array screening (guards.py:173-218 contract).

    Accepts numpy or JAX arrays; reductions run wherever the arrays live
    (on device for JAX inputs — only scalars cross to the host).
    """
    import jax.numpy as jnp

    s = jnp.asarray(s_final)
    v = jnp.asarray(v_final)
    issues = []

    nan_s = int(jnp.isnan(s).sum())
    nan_v = int(jnp.isnan(v).sum())
    inf_s = int(jnp.isinf(s).sum())
    inf_v = int(jnp.isinf(v).sum())
    if nan_s:
        issues.append(f"{nan_s} NaN values in S_final")
    if nan_v:
        issues.append(f"{nan_v} NaN values in v_final")
    if inf_s:
        issues.append(f"{inf_s} Inf values in S_final")
    if inf_v:
        issues.append(f"{inf_v} Inf values in v_final")

    neg_s = int((s < 0).sum())
    if neg_s:
        issues.append(f"{neg_s} negative S values")

    max_v = float(jnp.max(v)) if v.size else 0.0
    if max_v > MAX_VARIANCE:
        issues.append(f"Max variance={max_v:.4f} exceeds limit={MAX_VARIANCE}")

    neg_v = int((v < -1e-10).sum())
    if neg_v:
        issues.append(f"{neg_v} negative variance values (truncation failed)")

    return {
        "valid": not issues,
        "issues": issues,
        "stats": {
            "S_mean": float(jnp.nanmean(s)),
            "S_std": float(jnp.nanstd(s)),
            "v_mean": float(jnp.nanmean(v)),
            "v_max": max_v,
        },
    }
