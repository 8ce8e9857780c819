"""Portfolio ("book") pricing and Greeks: many heterogeneous contracts in one
vmapped device program.

A desk books hundreds of positions across strikes, expiries, and sides. The
reference prices one contract per HTTP call (engine/app.py:130-164) — a
Python round-trip per position. Here the whole book is a *vmapped axis*:

- one `vmap` over (spot, strike, T, φ) prices every contract off its own
  path set in a single fused launch (T varies per contract — the step grid is
  shared at `num_steps`, with per-contract dt = T/num_steps);
- call/put handled branchlessly via the sign trick φ ∈ {+1, −1},
  payoff = max(φ·(S_T − K), 0);
- book Greeks are a vmapped `jax.grad` — per-position delta/vega/theta/rho
  in one forward+backward sweep over the batch.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcos_tpu.models.params import SVJParams
from mcos_tpu.ops import simulate
from mcos_tpu.ops.bs import bs_price

Array = jax.Array


@partial(jax.jit, static_argnames=("num_paths", "num_steps",
                                   "control_variate"))
def _price_one(params: SVJParams, spot, strike, T, phi, key, *,
               num_paths: int, num_steps: int, control_variate: bool = True):
    """Scalar CV price of one contract; φ=+1 call, φ=−1 put. Differentiable."""
    s_final, _, g_final = simulate.simulate_terminal(
        params, spot, T, key, num_paths=num_paths, num_steps=num_steps,
        antithetic=True, companion=control_variate)
    discount = jnp.exp(-params.r * T)
    pay = simulate.combine_antithetic(
        jnp.maximum(phi * (s_final - strike), 0.0))
    mean, se = simulate.mc_mean_stderr(pay)
    price = discount * mean
    if control_variate:
        sigma = jnp.sqrt(params.v0)
        # φ-aware BS reference via parity-free direct formulas.
        bs_call = bs_price(spot, strike, T, params.r, params.q, sigma, True)
        bs_put = bs_price(spot, strike, T, params.r, params.q, sigma, False)
        bs_ref = jnp.where(phi > 0, bs_call, bs_put)
        ctrl = simulate.combine_antithetic(
            jnp.maximum(phi * (g_final - strike), 0.0))
        cv_pay = pay - (ctrl - bs_ref / discount)
        mean, se = simulate.mc_mean_stderr(cv_pay)
        price = discount * mean
    return price, discount * se


@partial(jax.jit, static_argnames=("num_paths", "num_steps"))
def _book_price_and_greeks(params: SVJParams, spots, strikes, Ts, phis,
                           keys, *, num_paths: int, num_steps: int):
    def scalar_price(spot, T, params_, strike, phi, key):
        price, se = _price_one(params_, spot, strike, T, phi, key,
                               num_paths=num_paths, num_steps=num_steps)
        return price, se  # se rides along as aux — one simulation total

    def one(spot, strike, T, phi, key):
        (price, se), (d_spot, d_T, d_params) = jax.value_and_grad(
            scalar_price, argnums=(0, 1, 2), has_aux=True)(
                spot, T, params, strike, phi, key)
        # theta = −∂P/∂T; vega = ∂P/∂v0; rho = ∂P/∂r — one backward pass.
        return price, se, d_spot, -d_T, d_params.v0, d_params.r

    return jax.vmap(one)(spots, strikes, Ts, phis, keys)


class BookEngine:
    """Vectorized portfolio pricer/risk over heterogeneous contracts."""

    def __init__(self, params: SVJParams, num_paths: int = 100_000,
                 num_steps: int = 64, seed: int = 42):
        self.params = params
        self.num_paths = int(num_paths)
        self.num_steps = int(num_steps)
        self.seed = int(seed)

    def price_book(self, spots: Sequence[float], strikes: Sequence[float],
                   Ts: Sequence[float], is_calls: Sequence[bool],
                   quantities: Sequence[float] | None = None) -> Dict:
        """Price + delta/vega/theta/rho for every position, plus aggregates.

        quantities: signed position sizes (long +, short −); default +1 each.
        """
        spots = jnp.asarray(spots, jnp.float32)
        strikes = jnp.asarray(strikes, jnp.float32)
        Ts = jnp.asarray(Ts, jnp.float32)
        phis = jnp.where(jnp.asarray(is_calls, bool), 1.0, -1.0).astype(
            jnp.float32)
        n = spots.shape[0]
        qty = (jnp.ones(n, jnp.float32) if quantities is None
               else jnp.asarray(quantities, jnp.float32))
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.key(self.seed), i))(jnp.arange(n))

        price, se, delta, theta, vega_v0, rho = _book_price_and_greeks(
            self.params, spots, strikes, Ts, phis, keys,
            num_paths=self.num_paths, num_steps=self.num_steps)
        # ∂P/∂v0 → per-vol-point convention (chain rule through σ = √v0,
        # same convention as GreeksEngine.vega).
        vega = vega_v0 * 2.0 * jnp.sqrt(self.params.v0)

        return {
            "price": np.asarray(price),
            "std_error": np.asarray(se),
            "delta": np.asarray(delta),
            "theta": np.asarray(theta),
            "vega": np.asarray(vega),
            "vega_v0": np.asarray(vega_v0),
            "rho": np.asarray(rho),
            "book_value": float(jnp.sum(qty * price)),
            "book_delta": float(jnp.sum(qty * delta)),
            "book_theta": float(jnp.sum(qty * theta)),
            "book_vega": float(jnp.sum(qty * vega)),
            "book_rho": float(jnp.sum(qty * rho)),
            "num_positions": int(n),
        }
