"""Model-risk report: anchored ATM agreement, degenerate collapse, and
the expected ordering of OTM-put dynamics premia."""

import numpy as np
import pytest

from mcos_tpu.engine.modelrisk import model_risk_report
from mcos_tpu.models.params import SVJParams


def test_degenerate_models_collapse():
    deg = SVJParams(kappa=3.0, theta=0.04, xi=1e-4, rho=0.0, v0=0.04,
                    lambda_j=0.0, mu_j=0.0, sigma_j=1e-4, r=0.065,
                    q=0.012)
    out = model_risk_report(22500.0, 22500.0, 0.25, svj=deg,
                            num_paths=16_384)
    p = out["prices"]
    assert p["heston"] == pytest.approx(p["bs"], rel=1e-4)
    assert p["svj"] == pytest.approx(p["bs"], rel=1e-4)


def test_otm_put_dynamics_premia():
    """For an OTM put: every skew/tail-generating model must price above
    flat BS, with full SVJ (jumps) the richest."""
    out = model_risk_report(22500.0, 21500.0, 0.25, is_call=False,
                            num_paths=65_536)
    p = out["prices"]
    assert p["heston"] > p["bs"]            # leverage skew
    assert p["svj"] > p["heston"]           # + crash jumps
    assert p["rough"] > p["bs"]             # rough skew
    assert out["model_risk_band_price"] > 0
    assert out["model_risk_band_volpts"] > 0.01
    ivs = out["implied_vols"]
    assert all(v is not None for v in ivs.values())
    # band consistency: max-min of the IVs matches the reported band
    band = max(ivs.values()) - min(ivs.values())
    assert out["model_risk_band_volpts"] == pytest.approx(band, abs=1e-12)


def test_anchoring_keeps_atm_tight():
    """All models share the ATM variance budget, so the ATM band in vol
    points must be far smaller than the OTM band."""
    atm = model_risk_report(22500.0, 22500.0, 0.25, num_paths=65_536)
    otm = model_risk_report(22500.0, 20500.0, 0.25, is_call=False,
                            num_paths=65_536)
    assert atm["model_risk_band_volpts"] < otm["model_risk_band_volpts"]
