"""Request schemas for the HTTP API.

Field names, defaults, and nesting mirror the reference's pydantic models
(reference: engine/app.py:53-119) so existing clients — including the
reference's own dashboards — post the same JSON bodies unchanged.
"""

from __future__ import annotations

from typing import Optional

from pydantic import BaseModel, Field

from mcos_tpu.config import DIVIDEND_YIELD, RISK_FREE_RATE
from mcos_tpu.models.params import SVJParams


class SVJParamsRequest(BaseModel):
    kappa: float = Field(3.0, description="Mean reversion speed")
    theta: float = Field(0.04, description="Long-run variance")
    xi: float = Field(0.5, description="Vol-of-vol")
    rho: float = Field(-0.7, description="Spot-vol correlation")
    v0: float = Field(0.04, description="Initial variance")
    lambda_j: float = Field(1.0, description="Jump intensity")
    mu_j: float = Field(-0.05, description="Mean jump size (log)")
    sigma_j: float = Field(0.10, description="Jump size volatility")
    r: float = Field(RISK_FREE_RATE, description="Risk-free rate")
    q: float = Field(DIVIDEND_YIELD, description="Dividend yield")

    def to_params(self) -> SVJParams:
        return SVJParams(**self.model_dump())


class PriceRequest(BaseModel):
    spot: float
    strike: float
    T: float
    is_call: bool = True
    params: SVJParamsRequest = SVJParamsRequest()
    num_paths: int = 500_000
    use_sobol: bool = True
    use_antithetic: bool = True
    use_control_variate: bool = True
    # Extension over the reference: CV semantics selector (see
    # engine/pricer.py on the reference's biased control variate).
    cv_mode: str = "companion"


class GreeksRequest(BaseModel):
    spot: float
    strike: float
    T: float
    is_call: bool = True
    params: SVJParamsRequest = SVJParamsRequest()
    num_paths: int = 200_000


class StressRequest(BaseModel):
    spot: float
    strike: float
    T: float
    is_call: bool = True
    params: SVJParamsRequest = SVJParamsRequest()
    num_paths: int = 100_000


class RegimeRequest(BaseModel):
    realized_vol: float
    iv_percentile: float
    skew_slope: float


class HedgeRequest(BaseModel):
    spot: float
    strike: float
    T: float
    is_call: bool = True
    params: SVJParamsRequest = SVJParamsRequest()
    num_scenarios: int = 500
    txn_cost_bps: float = 5.0
    slippage_bps: float = 2.0


class SmileRequest(BaseModel):
    spot: float
    T: float
    params: SVJParamsRequest = SVJParamsRequest()


class ExoticRequest(BaseModel):
    """POST /api/exotic — Asian / barrier / lookback pricing (capability
    beyond the reference's European-only engine)."""
    spot: float
    T: float
    kind: str  # "asian" | "barrier" | "lookback"
    strike: Optional[float] = None       # None ⇒ floating-strike lookback
    is_call: bool = True
    averaging: str = "arithmetic"        # asian only
    barrier: Optional[float] = None      # barrier only
    knock: str = "out"                   # barrier only
    params: SVJParamsRequest = SVJParamsRequest()
    num_paths: int = 200_000


class AmericanRequest(BaseModel):
    """POST /api/american — Longstaff-Schwartz American pricing (beyond the
    reference's European-only engine)."""
    spot: float
    strike: float
    T: float
    is_call: bool = True
    params: SVJParamsRequest = SVJParamsRequest()
    num_paths: int = 200_000


class BookRequest(BaseModel):
    """POST /api/book — vectorized portfolio pricing + Greeks (new)."""
    spots: list[float]
    strikes: list[float]
    Ts: list[float]
    is_calls: list[bool]
    quantities: Optional[list[float]] = None
    params: SVJParamsRequest = SVJParamsRequest()
    num_paths: int = 100_000


class SurfaceRequest(BaseModel):
    """POST /api/surface — full-chain IV extraction + arbitrage report +
    per-maturity SABR fits (the reference keeps surface tooling library-only,
    engine/surface.py)."""
    spot: float
    strikes: list[float]
    maturities: list[float]
    call_prices: list[list[float]]   # (num_maturities, num_strikes)
    put_prices: list[list[float]]
    bid_ask_spreads: Optional[list[list[float]]] = None
    r: float = RISK_FREE_RATE
    q: float = DIVIDEND_YIELD
    fit_sabr: bool = True


class CalibrateRequest(BaseModel):
    """POST /api/calibrate — advertised by the reference's docstring
    (engine/app.py:9) but never implemented there (SURVEY.md §1); this
    framework ships it."""
    spot: float
    strikes: list[float]
    T: float
    market_prices: list[float]
    is_call: bool = True
    r: float = RISK_FREE_RATE
    q: float = DIVIDEND_YIELD
    bid_ask_spreads: Optional[list[float]] = None
    atm_vol: float = 0.15
    num_paths: int = 100_000
