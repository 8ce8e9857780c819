"""Market quote service: live proxy with offline fallback.

Equivalent of the reference's quote stack (reference: server.js:34-100,
proxy.py:41-93, api/quote.js:10-73 — three copies of the same Yahoo Finance
v8 chart proxy) plus its static NIFTY universe (js/stocks.js:2-76), unified
into one module:

- `fetch_live_quote(symbol)`: GET Yahoo's 1-year daily chart for SYMBOL.NS,
  return last close, annualized realized vol from log-return stddev (×√245,
  the reference's day-count at server.js:69-80), name, 52-week hi/lo.
- `fetch_quote(symbol)`: live quote, falling back to the static universe when
  the network is unreachable (this deployment environment has zero egress) —
  the same graceful-degradation contract the reference's frontend relies on
  (js/app.js:126-142: 503 → cached price + typical vol + 'CACHED' badge).
"""

from __future__ import annotations

import json
import logging
import math
import urllib.error
import urllib.request
from typing import Dict, Optional

logger = logging.getLogger("mcos_tpu.quotes")

YAHOO_URL = ("https://query1.finance.yahoo.com/v8/finance/chart/"
             "{symbol}.NS?interval=1d&range=1y")
TRADING_DAYS = 245  # reference's annualization day-count (server.js:79)

# Static NIFTY-50 universe: sector + typical price/vol for offline operation
# (role of js/stocks.js:2-68; representative values, refreshed by any live
# quote that succeeds).
NIFTY50: Dict[str, Dict] = {
    "NIFTY": {"name": "NIFTY 50 Index", "sector": "Index", "price": 22500.0, "vol": 0.14},
    "RELIANCE": {"name": "Reliance Industries", "sector": "Energy", "price": 2950.0, "vol": 0.22},
    "TCS": {"name": "Tata Consultancy Services", "sector": "IT", "price": 3850.0, "vol": 0.20},
    "HDFCBANK": {"name": "HDFC Bank", "sector": "Banking", "price": 1650.0, "vol": 0.21},
    "INFY": {"name": "Infosys", "sector": "IT", "price": 1550.0, "vol": 0.24},
    "ICICIBANK": {"name": "ICICI Bank", "sector": "Banking", "price": 1150.0, "vol": 0.23},
    "HINDUNILVR": {"name": "Hindustan Unilever", "sector": "FMCG", "price": 2450.0, "vol": 0.18},
    "ITC": {"name": "ITC", "sector": "FMCG", "price": 440.0, "vol": 0.19},
    "SBIN": {"name": "State Bank of India", "sector": "Banking", "price": 830.0, "vol": 0.28},
    "BHARTIARTL": {"name": "Bharti Airtel", "sector": "Telecom", "price": 1450.0, "vol": 0.23},
    "KOTAKBANK": {"name": "Kotak Mahindra Bank", "sector": "Banking", "price": 1780.0, "vol": 0.22},
    "LT": {"name": "Larsen & Toubro", "sector": "Infrastructure", "price": 3600.0, "vol": 0.24},
    "AXISBANK": {"name": "Axis Bank", "sector": "Banking", "price": 1120.0, "vol": 0.26},
    "ASIANPAINT": {"name": "Asian Paints", "sector": "Consumer", "price": 2900.0, "vol": 0.22},
    "MARUTI": {"name": "Maruti Suzuki", "sector": "Auto", "price": 12500.0, "vol": 0.24},
    "TITAN": {"name": "Titan Company", "sector": "Consumer", "price": 3400.0, "vol": 0.25},
    "SUNPHARMA": {"name": "Sun Pharmaceutical", "sector": "Pharma", "price": 1600.0, "vol": 0.22},
    "ULTRACEMCO": {"name": "UltraTech Cement", "sector": "Cement", "price": 10800.0, "vol": 0.23},
    "WIPRO": {"name": "Wipro", "sector": "IT", "price": 520.0, "vol": 0.26},
    "NTPC": {"name": "NTPC", "sector": "Power", "price": 360.0, "vol": 0.27},
    "TATAMOTORS": {"name": "Tata Motors", "sector": "Auto", "price": 980.0, "vol": 0.33},
    "TATASTEEL": {"name": "Tata Steel", "sector": "Metals", "price": 165.0, "vol": 0.32},
    "POWERGRID": {"name": "Power Grid Corp", "sector": "Power", "price": 310.0, "vol": 0.24},
    "BAJFINANCE": {"name": "Bajaj Finance", "sector": "NBFC", "price": 7100.0, "vol": 0.30},
    "HCLTECH": {"name": "HCL Technologies", "sector": "IT", "price": 1480.0, "vol": 0.25},
    "ADANIENT": {"name": "Adani Enterprises", "sector": "Conglomerate", "price": 3100.0, "vol": 0.42},
    "ONGC": {"name": "Oil & Natural Gas Corp", "sector": "Energy", "price": 270.0, "vol": 0.30},
    "COALINDIA": {"name": "Coal India", "sector": "Mining", "price": 480.0, "vol": 0.29},
    "M&M": {"name": "Mahindra & Mahindra", "sector": "Auto", "price": 2850.0, "vol": 0.27},
    "HINDALCO": {"name": "Hindalco Industries", "sector": "Metals", "price": 650.0, "vol": 0.33},
}


def get_stock_by_symbol(symbol: str) -> Optional[Dict]:
    """Universe lookup (js/stocks.js:70-72 role)."""
    return NIFTY50.get(symbol.upper())


def get_fallback_price(symbol: str) -> Optional[float]:
    """Offline price lookup (js/stocks.js:74-76 role)."""
    info = NIFTY50.get(symbol.upper())
    return info["price"] if info else None


def realized_vol_from_closes(closes, annualize: int = TRADING_DAYS) -> float:
    """Annualized σ from daily log returns (server.js:69-80 semantics)."""
    closes = [c for c in closes if c is not None and c > 0]
    if len(closes) < 3:
        return float("nan")
    rets = [math.log(b / a) for a, b in zip(closes, closes[1:])]
    mean = sum(rets) / len(rets)
    var = sum((x - mean) ** 2 for x in rets) / len(rets)
    return math.sqrt(var) * math.sqrt(annualize)


def fetch_live_quote(symbol: str, timeout: float = 5.0) -> Optional[Dict]:
    """Yahoo Finance v8 chart proxy (server.js:34-100 semantics).

    Returns None on any network/parse failure (graceful degradation).
    """
    url = YAHOO_URL.format(symbol=symbol.upper())
    try:
        req = urllib.request.Request(url, headers={"User-Agent": "mcos-tpu"})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            data = json.loads(resp.read())
        result = data["chart"]["result"][0]
        meta = result["meta"]
        closes = result["indicators"]["quote"][0]["close"]
        closes = [c for c in closes if c]
        price = meta.get("regularMarketPrice") or closes[-1]
        return {
            "symbol": symbol.upper(),
            "price": float(price),
            "volatility": realized_vol_from_closes(closes),
            "name": meta.get("longName") or meta.get("shortName")
            or symbol.upper(),
            "high52": float(max(closes)),
            "low52": float(min(closes)),
            "source": "LIVE",
        }
    except (urllib.error.URLError, OSError, KeyError, IndexError,
            ValueError) as e:
        logger.warning("live quote for %s failed: %s", symbol, e)
        return None


def fetch_quote(symbol: str) -> Optional[Dict]:
    """Live quote with static-universe fallback (js/app.js:126-142 contract:
    the caller renders `source: CACHED` as the offline badge)."""
    live = fetch_live_quote(symbol)
    if live is not None:
        return live
    info = get_stock_by_symbol(symbol)
    if info is None:
        return None
    return {
        "symbol": symbol.upper(),
        "price": info["price"],
        "volatility": info["vol"],
        "name": info["name"],
        "high52": info["price"] * 1.15,
        "low52": info["price"] * 0.85,
        "source": "CACHED",
    }
