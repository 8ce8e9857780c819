"""Multi-asset American/Bermudan options: LSM on the correlated SVJ basket.

Capability beyond the reference (European, single-asset only) and beyond
this framework's own single-asset LSM: Bermudan rights on functions of
SEVERAL correlated SVJ assets — the Broadie-Glasserman max-call (the
standard high-dimensional early-exercise benchmark), min-puts, and
weighted-basket puts/calls.

Design: the backward-induction algebra is `engine/american.py:
lsm_backward_cashflows` — the SAME function the single-asset and
distributed LSM use, not a twin. Only two things are multi-asset:

- the path sheet: `engine/basket.py:simulate_basket_observations` records
  the (dates, assets, paths) correlated-SVJ state at the exercise dates
  (antithetic branches folded into the path axis — both are valid paths
  for the regression, and cashflows are pair-averaged for the stderr);
- the regression basis: polynomials in the top-two ORDER STATISTICS of
  normalized moneyness plus the basket mean and the normalized payoff —
  the Andersen-Broadie basis family, symmetric under asset relabeling
  (sorting is what lets one fixed-width basis serve any asset count).

The distributed variant rides the same psum-pooled normal-equation hook
as `parallel/mesh.py:sharded_american_price`.

Oracles (tests/test_basket_american.py): the Broadie-Glasserman 2-asset
GBM max-call table (Andersen-Broadie 2004 report 13.90 at S0=100 for the
9-date Bermudan), the Stulz closed form in the one-right (European)
degenerate limit, and more-rights monotonicity.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mcos_tpu.engine.american import lsm_backward_cashflows
from mcos_tpu.engine.basket import simulate_basket_observations
from mcos_tpu.models.params import SVJParams

Array = jax.Array


def _ma_payoff_fn(strike, kind: str, is_call: bool, weights):
    """Payoff on an (A, paths) date-slice of the sheet → (paths,)."""
    phi = 1.0 if is_call else -1.0

    def payoff(s):
        if kind == "max":
            under = jnp.max(s, axis=0)
        elif kind == "min":
            under = jnp.min(s, axis=0)
        else:  # basket
            under = jnp.sum(weights[:, None] * s, axis=0)
        return jnp.maximum(phi * (under - strike), 0.0)

    return payoff


def _ma_basis_fn(strike, kind: str, is_call: bool, weights):
    """Order-statistic regression basis on an (A, paths) slice → (paths, 9).

    Columns: 1, y1, y1^2, y2, y2^2, y1*y2, m, m^2, payoff/K, with
    y1 >= y2 the two largest normalized moneynesses and m the basket mean
    — relabeling-symmetric (the continuation value is), and the payoff
    regressor keeps the deep-ITM fit tight (same rationale as the
    single-asset basis, engine/american.py)."""
    payoff = _ma_payoff_fn(strike, kind, is_call, weights)

    def basis(s):
        y = -jnp.sort(-(s / strike - 1.0), axis=0)   # descending
        y1, y2 = y[0], y[1]
        m = jnp.sum(weights[:, None] * s, axis=0) / strike - 1.0
        one = jnp.ones_like(y1)
        pay = payoff(s) / strike
        return jnp.stack([one, y1, y1 * y1, y1 * y1 * y1,
                          y2, y2 * y2, y2 * y2 * y2,
                          y1 * y2, y1 * y1 * y2, y1 * y2 * y2,
                          m, pay, pay * y1], axis=-1)

    return basis


@partial(jax.jit, static_argnames=("num_paths", "n_ex", "steps_per_period",
                                   "kind", "is_call"))
def lsm_basket_price(params_batch: SVJParams, spots: Array,
                     corr_chol: Array, strike, T, r_num, key: Array, *,
                     num_paths: int, n_ex: int, steps_per_period: int,
                     kind: str, is_call: bool,
                     weights: Optional[Array] = None) -> Dict[str, Array]:
    """Bermudan multi-asset LSM price with rights at t_1..t_{n_ex} (= T).

    `r_num` is the numéraire (quote-currency) rate used for discounting —
    per-asset rates in `params_batch` drive each asset's own carry.
    """
    dtype = jnp.float32
    strike = jnp.asarray(strike, dtype)
    n_assets = spots.shape[0]
    if weights is None:
        weights = jnp.full((n_assets,), 1.0 / n_assets, dtype)
    levels = simulate_basket_observations(
        params_batch, spots, corr_chol, T, key, num_paths=num_paths,
        n_obs=n_ex, steps_per_period=steps_per_period)
    # (n_ex, 2, A, paths) → (n_ex, A, 2*paths): antithetic branches join
    # the path axis (branch-major, so pair i sits at [i] and [paths + i]).
    sheet = (jnp.asarray(spots, dtype)[None, None, :, None] * levels)
    sheet = sheet.swapaxes(1, 2).reshape(n_ex, n_assets, 2 * num_paths)

    payoff = _ma_payoff_fn(strike, kind, is_call, weights)
    basis = _ma_basis_fn(strike, kind, is_call, weights)
    dt_ex = jnp.asarray(T, dtype) / n_ex
    sdf = jnp.full((n_ex,), jnp.exp(-jnp.asarray(r_num, dtype) * dt_ex))
    allowed = jnp.ones((n_ex - 1,), bool)
    cf = lsm_backward_cashflows(payoff(sheet[-1]), sheet, sheet, allowed,
                                sdf, payoff, basis)
    # Pair-average the antithetic halves before the stderr (the two
    # branches of one pair are negatively correlated by construction).
    cf_pair = 0.5 * (cf[:num_paths] + cf[num_paths:])
    price = jnp.mean(cf_pair)
    se = jnp.std(cf_pair) / jnp.sqrt(jnp.float32(num_paths))
    intrinsic = payoff(jnp.asarray(spots, dtype)[:, None])[0]
    return {
        "price": jnp.maximum(price, intrinsic),
        "std_error": se,
        "mc_continuation": price,
        "intrinsic": intrinsic,
    }


def price_basket_american(engine, spots, strike: float, T: float, *,
                          kind: str = "max", is_call: bool = True,
                          weights=None, n_ex: int = 9,
                          steps_per_period: int = 8) -> Dict[str, float]:
    """Engine-convention wrapper over `lsm_basket_price`.

    `engine` is a `BasketEngine` (stacked params + jittered Cholesky);
    `kind`: "max" (best-of), "min" (worst-of), or "basket" (needs
    `weights`). `n_ex` exercise rights at t_1..T, `steps_per_period`
    simulation sub-steps between rights (1 is exact under GBM dynamics;
    stochastic vol/jumps need the sub-steps).
    """
    if kind not in ("max", "min", "basket"):
        raise ValueError("kind must be 'max', 'min', or 'basket'")
    if len(engine.params_list) < 2:
        raise ValueError("multi-asset LSM needs >= 2 assets "
                         "(single-asset: use AmericanEngine)")
    if kind == "basket" and weights is None:
        raise ValueError("kind='basket' needs weights")
    w = (jnp.asarray(weights, jnp.float32) if weights is not None else None)
    res = jax.device_get(lsm_basket_price(
        engine._batch, jnp.asarray(spots, jnp.float32), engine._chol,
        strike, T, float(engine.params_list[0].r),
        jax.random.key(engine.seed), num_paths=engine.num_paths,
        n_ex=int(n_ex), steps_per_period=int(steps_per_period),
        kind=kind, is_call=is_call, weights=w))
    out = {k: float(v) for k, v in res.items()}
    out.update(n_exercise=int(n_ex), steps_per_period=int(steps_per_period),
               num_paths_used=engine.num_paths, kind=kind)
    return out
