"""SPAN-style portfolio initial margin (16-scenario risk arrays).

Capability beyond the reference: NSE F&O margins option books with standard
SPAN (CME methodology) — scan the portfolio over a price/vol scenario grid,
charge the worst loss. The scenario set here is the classic 16-point array:

    1-2:   price unchanged,            vol +VSR / −VSR
    3-14:  price ±{1/3, 2/3, 3/3}·PSR, vol +VSR / −VSR
    15-16: price ±extreme_mult·PSR, base vol, charged at `extreme_coverage`

with PSR the price scan range (fraction of spot) and VSR the vol scan range
(absolute shift of σ). NSE's parameters for index options are roughly
PSR 6%, VSR 4% (wider for stocks) — the defaults; all four knobs are
request-settable.

Execution model (one CRN pass, not 16 repricings): the SVJ log-dynamics are
independent of S₀, so every price scenario is a payoff-axis transform on one
shared path set —

    V(f·S₀, K) = f · V(S₀, K/f)

(the StressTestEngine identity, engine/risk.py:125-137). Vol scenarios
change the dynamics, so they ride a 3-member vmapped params batch
(σ−VSR, base, σ+VSR in v0 AND θ). Total device work per distinct maturity:
ONE vmapped program over 3 dynamics × (positions · 9 spot factors) strikes,
with a single shared key — scenario differences carry no MC noise beyond
the payoff's own.

Margin properties the tests pin: a perfectly hedged book margins to zero
(exact under CRN), long-option margin is bounded by its premium,
subadditivity margin(A+B) ≤ margin(A) + margin(B) (max of sums vs sum of
maxes).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcos_tpu.config import scaled_steps
from mcos_tpu.models.params import SVJParams
from mcos_tpu.ops import simulate

Array = jax.Array


def _vol_shift(params: SVJParams, dv: float) -> SVJParams:
    """Shift the vol *level* by dv: σ → σ+dv applied to √v0 and √θ."""
    s0 = max(float(params.v0), 1e-8) ** 0.5
    st = max(float(params.theta), 1e-8) ** 0.5
    return params.replace(v0=max(s0 + dv, 0.01) ** 2,
                          theta=max(st + dv, 0.01) ** 2)


@partial(jax.jit, static_argnames=("num_paths", "num_steps"))
def _scenario_price_table(params_batch, spot, strikes, T, key, flags, *,
                          num_paths: int, num_steps: int) -> Array:
    """(n_vol_states, n_strikes) discounted European prices off CRN paths.

    `flags` (n_strikes,) float32 — +1 call / −1 put, matching the flattened
    strike vector (positions × factors).
    """
    def one(p):
        s_final, _, _ = simulate.simulate_terminal(
            p, spot, T, key, num_paths=num_paths, num_steps=num_steps,
            antithetic=True, companion=False)
        # (K, branch, paths) signed payoff; flags select call/put per row.
        diff = s_final[None] - strikes[:, None, None]
        pay = jnp.maximum(flags[:, None, None] * diff, 0.0)
        pay = simulate.combine_antithetic(jnp.swapaxes(pay, 0, 1))
        return jnp.exp(-p.r * jnp.asarray(T, jnp.float32)) \
            * jnp.mean(pay, axis=-1)

    return jax.vmap(one)(params_batch)


class MarginEngine:
    """SPAN-style margin for a single-underlying option book."""

    def __init__(self, params: SVJParams, num_paths: int = 200_000,
                 num_steps: int = 252, seed: int = 42,
                 price_scan_range: float = 0.06,
                 vol_scan_range: float = 0.04,
                 extreme_multiplier: float = 2.0,
                 extreme_coverage: float = 0.35):
        self.params = params
        self.num_paths = int(num_paths)
        self.num_steps = int(num_steps)
        self.seed = int(seed)
        self.psr = float(price_scan_range)
        self.vsr = float(vol_scan_range)
        self.extreme_mult = float(extreme_multiplier)
        self.extreme_coverage = float(extreme_coverage)

    def margin(self, spot: float, strikes: Sequence[float],
               Ts: Sequence[float], is_calls: Sequence[bool],
               quantities: Sequence[float]) -> Dict:
        """Portfolio SPAN margin. quantities: signed (+ long, − short)."""
        strikes = np.asarray(strikes, np.float64)
        Ts = np.asarray(Ts, np.float64)
        calls = np.asarray(is_calls, bool)
        qty = np.asarray(quantities, np.float64)
        n = len(strikes)
        if not (len(Ts) == len(calls) == len(qty) == n and n > 0):
            raise ValueError("strikes/Ts/is_calls/quantities must be equal, "
                             "nonzero length")

        # Spot factors: base, ±1/3, ±2/3, ±1 of PSR, ± extreme.
        thirds = self.psr * np.array([1 / 3, 2 / 3, 1.0])
        factors = np.concatenate([[1.0], 1.0 + thirds, 1.0 - thirds,
                                  [1.0 + self.extreme_mult * self.psr,
                                   1.0 - self.extreme_mult * self.psr]])
        n_f = len(factors)                      # 9
        params_batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x, jnp.float32) for x in xs]),
            _vol_shift(self.params, -self.vsr), self.params,
            _vol_shift(self.params, +self.vsr))

        # Price table P[T-group → (3 vol states, positions·factors)]
        prices = np.zeros((3, n, n_f))
        key = jax.random.key(self.seed)
        for T in np.unique(Ts):
            rows = np.nonzero(Ts == T)[0]
            k_eff = (strikes[rows][:, None] / factors[None, :])  # (m, n_f)
            flags = np.where(calls[rows], 1.0, -1.0)
            flags_flat = np.repeat(flags, n_f).astype(np.float32)
            tab = jax.device_get(_scenario_price_table(
                params_batch, float(spot),
                jnp.asarray(k_eff.reshape(-1), jnp.float32), float(T),
                jax.random.fold_in(key, int(round(T * 1e4))),
                jnp.asarray(flags_flat),
                num_paths=self.num_paths,
                num_steps=scaled_steps(self.num_steps, float(T))))
            prices[:, rows, :] = np.asarray(tab, np.float64).reshape(
                3, len(rows), n_f)

        # V[vol_state, pos, factor] = f · price(K/f): scenario value per lot.
        values = prices * factors[None, None, :]
        v_base = values[1, :, 0]                                 # base vol, f=1

        scen_losses: List[float] = []
        scen_labels: List[str] = []
        move_idx = {0.0: 0}
        for i, m in enumerate(thirds, start=1):
            move_idx[m] = i          # up factors at 1..3
            move_idx[-m] = i + 3     # down factors at 4..6
        for m in [0.0, thirds[0], -thirds[0], thirds[1], -thirds[1],
                  thirds[2], -thirds[2]]:
            for vol_state, vol_name in ((2, "vol+"), (0, "vol-")):
                v_scen = values[vol_state, :, move_idx[m]]
                loss = float(np.sum(qty * (v_base - v_scen)))
                scen_losses.append(loss)
                scen_labels.append(f"price{m:+.4f}, {vol_name}")
        for j, sign in ((7, "+"), (8, "-")):     # extremes, base vol, weighted
            v_scen = values[1, :, j]
            loss = self.extreme_coverage * float(np.sum(qty * (v_base - v_scen)))
            scen_losses.append(loss)
            scen_labels.append(
                f"price{sign}{self.extreme_mult:.0f}x, extreme "
                f"({self.extreme_coverage:.0%})")

        worst = int(np.argmax(scen_losses))
        scan_risk = max(scen_losses[worst], 0.0)
        net_value = float(np.sum(qty * v_base))
        return {
            "margin": scan_risk,
            "scan_risk": scan_risk,
            "worst_scenario": scen_labels[worst],
            "risk_array": [round(x, 6) for x in scen_losses],
            "scenario_labels": scen_labels,
            "net_option_value": net_value,
            "price_scan_range": self.psr,
            "vol_scan_range": self.vsr,
            "num_scenarios": len(scen_losses),
        }
