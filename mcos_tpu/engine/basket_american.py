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


def _ma_underlier_fn(kind: str, weights):
    """max / min / weighted-sum over the asset axis (-2, so the same
    function serves (A, paths) date slices AND the dual's nested
    (n_inner, A, paths) blocks)."""
    def under(s):
        if kind == "max":
            return jnp.max(s, axis=-2)
        if kind == "min":
            return jnp.min(s, axis=-2)
        return jnp.sum(weights[:, None] * s, axis=-2)
    return under


def _ma_payoff_fn(strike, kind: str, is_call: bool, weights):
    """Payoff on an (..., A, paths) slice → (..., paths)."""
    phi = 1.0 if is_call else -1.0
    under = _ma_underlier_fn(kind, weights)

    def payoff(s):
        return jnp.maximum(phi * (under(s) - strike), 0.0)

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


def _ma_value_basis_fn(strike, weights):
    """Powers-only value basis (no payoff regressor — exactly collinear
    with the order statistics on all-ITM slices, harmless for the policy
    decision but fatal for the dual, which evaluates the fit everywhere;
    same rationale as the single-asset `_value_basis`). Works on any
    (..., A, paths) block (asset axis = -2)."""
    def vbasis(s):
        y = -jnp.sort(-(s / strike - 1.0), axis=-2)
        y1, y2 = y[..., 0, :], y[..., 1, :]
        m = jnp.sum(weights[:, None] * s, axis=-2) / strike - 1.0
        one = jnp.ones_like(y1)
        return jnp.stack([one, y1, y1 * y1, y1**3, y2, y2 * y2, y1 * y2,
                          m], axis=-1)
    return vbasis


@partial(jax.jit, static_argnames=("num_paths", "n_ex", "steps_per_period",
                                   "kind", "is_call"))
def lsm_basket_train(params_batch: SVJParams, spots: Array,
                     corr_chol: Array, strike, T, r_num, key: Array, *,
                     num_paths: int, n_ex: int, steps_per_period: int,
                     kind: str, is_call: bool,
                     weights: Optional[Array] = None):
    """Fit the per-date regressions on a training sheet: {"policy"
    ((n_ex−1, 13) masked stopping-rule fits), "value" ((n_ex−1, 8)
    unmasked continuation-value fits for the dual)."""
    from mcos_tpu.engine.american import solve_normal_equations
    from mcos_tpu.engine.basket import simulate_basket_states

    dtype = jnp.float32
    strike = jnp.asarray(strike, dtype)
    n_assets = spots.shape[0]
    if weights is None:
        weights = jnp.full((n_assets,), 1.0 / n_assets, dtype)
    levels, _ = simulate_basket_states(
        params_batch, spots, corr_chol, T, key, num_paths=num_paths,
        n_obs=n_ex, steps_per_period=steps_per_period)
    sheet = (jnp.asarray(spots, dtype)[None, None, :, None] * levels)
    sheet = sheet.swapaxes(1, 2).reshape(n_ex, n_assets, 2 * num_paths)

    payoff = _ma_payoff_fn(strike, kind, is_call, weights)
    basis = _ma_basis_fn(strike, kind, is_call, weights)
    vbasis = _ma_value_basis_fn(strike, weights)
    df = jnp.exp(-jnp.asarray(r_num, dtype)
                 * jnp.asarray(T, dtype) / n_ex)

    def backstep(cf, s_state):
        cf = cf * df
        pay = payoff(s_state)
        itm = pay > 0.0
        w = itm.astype(dtype)
        b = basis(s_state)
        bw = b * w[:, None]
        coef = solve_normal_equations(b.T @ bw, bw.T @ cf)
        cont = b @ coef
        bv = vbasis(s_state)
        coef_v = solve_normal_equations(bv.T @ bv, bv.T @ cf)
        exercise = itm & (pay > cont)
        return jnp.where(exercise, pay, cf), (coef, coef_v)

    _, (coefs, coefs_v) = jax.lax.scan(backstep, payoff(sheet[-1]),
                                       sheet[:-1], reverse=True)
    return {"policy": coefs, "value": coefs_v}


def _lower_bound_pairs(params_batch: SVJParams, spots: Array,
                       corr_chol: Array, strike, T, r_num, key: Array,
                       coefs: Array, *, num_paths: int, n_ex: int,
                       steps_per_period: int, kind: str, is_call: bool,
                       weights: Optional[Array] = None) -> Array:
    """(num_paths,) antithetic-pair values of the FIXED stopping rule on
    fresh paths (the lower-bound estimator's per-pair samples; shared by
    the single-device wrapper and the mesh driver)."""
    from mcos_tpu.engine.basket import simulate_basket_states

    dtype = jnp.float32
    strike = jnp.asarray(strike, dtype)
    n_assets = spots.shape[0]
    if weights is None:
        weights = jnp.full((n_assets,), 1.0 / n_assets, dtype)
    levels, _ = simulate_basket_states(
        params_batch, spots, corr_chol, T, key, num_paths=num_paths,
        n_obs=n_ex, steps_per_period=steps_per_period)
    sheet = (jnp.asarray(spots, dtype)[None, None, :, None] * levels)
    sheet = sheet.swapaxes(1, 2).reshape(n_ex, n_assets, 2 * num_paths)

    payoff = _ma_payoff_fn(strike, kind, is_call, weights)
    basis = _ma_basis_fn(strike, kind, is_call, weights)
    dt_ex = jnp.asarray(T, dtype) / n_ex
    r_num = jnp.asarray(r_num, dtype)

    def fwd(carry, inputs):
        stopped, value = carry
        k, coef, s_k = inputs
        pay = payoff(s_k)
        cont = basis(s_k) @ coef
        exercise = (~stopped) & (pay > 0.0) & (pay > cont)
        disc = jnp.exp(-r_num * dt_ex * (k + 1.0))
        value = jnp.where(exercise, disc * pay, value)
        return (stopped | exercise, value), None

    n_paths = sheet.shape[-1]
    init = (jnp.zeros((n_paths,), bool), jnp.zeros((n_paths,), dtype))
    (stopped, value), _ = jax.lax.scan(
        fwd, init, (jnp.arange(n_ex - 1, dtype=dtype), coefs, sheet[:-1]))
    disc_T = jnp.exp(-r_num * jnp.asarray(T, dtype))
    value = jnp.where(stopped, value, disc_T * payoff(sheet[-1]))
    return 0.5 * (value[:num_paths] + value[num_paths:])


@partial(jax.jit, static_argnames=("num_paths", "n_ex", "steps_per_period",
                                   "kind", "is_call"))
def lsm_basket_lower_bound(params_batch: SVJParams, spots: Array,
                           corr_chol: Array, strike, T, r_num, key: Array,
                           coefs: Array, *, num_paths: int, n_ex: int,
                           steps_per_period: int, kind: str, is_call: bool,
                           weights: Optional[Array] = None
                           ) -> Dict[str, Array]:
    """Evaluate the FIXED stopping rule on fresh paths → a true lower
    bound (any measurable rule under-prices the Bermudan)."""
    pair = _lower_bound_pairs(
        params_batch, spots, corr_chol, strike, T, r_num, key, coefs,
        num_paths=num_paths, n_ex=n_ex, steps_per_period=steps_per_period,
        kind=kind, is_call=is_call, weights=weights)
    return {"price": jnp.mean(pair),
            "std_error": jnp.std(pair) / jnp.sqrt(jnp.float32(num_paths))}


def _dual_pairs(params_batch: SVJParams, spots: Array,
                corr_chol: Array, strike, T, r_num,
                key: Array, coefs_v: Array, *, n_outer: int,
                n_inner: int, n_ex: int,
                steps_per_period: int, kind: str,
                is_call: bool,
                weights: Optional[Array] = None) -> Array:
    """Haugh-Kogan / Andersen-Broadie dual upper bound for the multi-asset
    Bermudan: M built from the trained value function V̂_k, conditional
    expectations by antithetic nested one-PERIOD simulations (each inner
    transition runs the same `_basket_step` sub-steps as the outer sheet).
    With the LSM lower bound this brackets the true price — the bracket
    the Andersen-Broadie max-call table publishes.
    """
    from mcos_tpu.engine.basket import (_basket_cols, _basket_step,
                                        simulate_basket_states)

    dtype = jnp.float32
    n_inner -= n_inner % 2
    strike = jnp.asarray(strike, dtype)
    spots = jnp.asarray(spots, dtype)
    n_assets = spots.shape[0]
    if weights is None:
        weights = jnp.full((n_assets,), 1.0 / n_assets, dtype)
    payoff = _ma_payoff_fn(strike, kind, is_call, weights)
    vbasis = _ma_value_basis_fn(strike, weights)
    cols = _basket_cols(params_batch)

    k_outer, k_inner = jax.random.split(key)
    levels, v_states = simulate_basket_states(
        params_batch, spots, corr_chol, T, k_outer, num_paths=n_outer,
        n_obs=n_ex, steps_per_period=steps_per_period)
    P = 2 * n_outer
    s_sheet = (spots[None, None, :, None] * levels) \
        .swapaxes(1, 2).reshape(n_ex, n_assets, P)
    v_sheet = v_states.swapaxes(1, 2).reshape(n_ex, n_assets, P)
    s0 = jnp.broadcast_to(spots[:, None], (n_assets, P))
    v0 = jnp.broadcast_to(jnp.asarray(params_batch.v0, dtype)[:, None],
                          (n_assets, P))
    s_prev = jnp.concatenate([s0[None], s_sheet[:-1]])
    v_prev = jnp.concatenate([v0[None], v_sheet[:-1]])

    dt_ex = jnp.asarray(T, dtype) / n_ex
    dt_sub = dt_ex / steps_per_period
    sqrt_dt = jnp.sqrt(dt_sub)
    r_num = jnp.asarray(r_num, dtype)

    under_fn = _ma_underlier_fn(kind, weights)

    def vhat(s, k, coef_k):
        """Time-t_k value estimate; terminal date → pure payoff. The fit
        is clamped to the no-arb window (cubic extrapolation runs wild
        where the outer paths wander)."""
        pay = payoff(s)
        cap = under_fn(s) if is_call else jnp.broadcast_to(strike,
                                                           pay.shape)
        cont = jnp.clip(vbasis(s) @ coef_k, 0.0, cap)
        return jnp.where(k >= n_ex, pay, jnp.maximum(pay, cont))

    def inner_transition(s_k, v_k, ki):
        """n_inner antithetic one-period transitions from every outer
        state: (n_inner, A, P) blocks through the shared step."""
        log_s = jnp.broadcast_to(jnp.log(s_k), (n_inner, n_assets, P))
        v = jnp.broadcast_to(v_k, (n_inner, n_assets, P))

        def sub(carry, j):
            log_s, v = carry
            kj = jax.random.fold_in(ki, j)
            kn, ku = jax.random.split(kj)
            zh = jax.random.normal(
                kn, (3, n_inner // 2, n_assets, P), dtype)
            z = jnp.concatenate([zh, -zh], axis=1)
            uh = jax.random.uniform(ku, (n_inner // 2, n_assets, P), dtype)
            u = jnp.concatenate([uh, uh], axis=0)
            z1 = jnp.einsum("ab,ibp->iap", corr_chol, z[0])
            log_s, v = _basket_step(cols, dt_sub, sqrt_dt, log_s, v,
                                    z1, z[1], z[2], u)
            return (log_s, v), None

        (log_s, _), _ = jax.lax.scan(sub, (log_s, v),
                                     jnp.arange(steps_per_period))
        return jnp.exp(log_s)

    n_vb = coefs_v.shape[1]
    coef_rows = jnp.concatenate([coefs_v, jnp.zeros((1, n_vb), dtype)])

    def dual_step(carry, inputs):
        m, best = carry
        k, coef_next, s_k, v_k, s_next = inputs
        ki = jax.random.fold_in(k_inner, k.astype(jnp.int32))
        s_in = inner_transition(s_k, v_k, ki)          # (n_inner, A, P)
        e_k = jnp.mean(vhat(s_in, k + 1, coef_next), axis=0)
        disc_next = jnp.exp(-r_num * dt_ex * (k + 1.0))
        m = m + disc_next * (vhat(s_next, k + 1, coef_next) - e_k)
        best = jnp.maximum(best, disc_next * payoff(s_next) - m)
        return (m, best), None

    init = (jnp.zeros((P,), dtype), jnp.full((P,), -jnp.inf, dtype))
    (_, best), _ = jax.lax.scan(
        dual_step, init,
        (jnp.arange(n_ex, dtype=dtype), coef_rows, s_prev, v_prev,
         s_sheet))
    return 0.5 * (best[:n_outer] + best[n_outer:])


@partial(jax.jit, static_argnames=("n_outer", "n_inner", "n_ex",
                                   "steps_per_period", "kind", "is_call"))
def dual_upper_bound_basket(params_batch: SVJParams, spots: Array,
                            corr_chol: Array, strike, T, r_num,
                            key: Array, coefs_v: Array, *, n_outer: int,
                            n_inner: int, n_ex: int,
                            steps_per_period: int, kind: str,
                            is_call: bool,
                            weights: Optional[Array] = None
                            ) -> Dict[str, Array]:
    """Single-device wrapper over `_dual_pairs` (see its docstring)."""
    pair = _dual_pairs(
        params_batch, spots, corr_chol, strike, T, r_num, key, coefs_v,
        n_outer=n_outer, n_inner=n_inner, n_ex=n_ex,
        steps_per_period=steps_per_period, kind=kind, is_call=is_call,
        weights=weights)
    return {"price": jnp.mean(pair),
            "std_error": jnp.std(pair) / jnp.sqrt(jnp.float32(n_outer))}


def price_bounds_basket(engine, spots, strike: float, T: float, *,
                        kind: str = "max", is_call: bool = True,
                        weights=None, n_ex: int = 9,
                        steps_per_period: int = 1, n_outer: int = 2048,
                        n_inner: int = 64) -> Dict[str, float]:
    """Bracket the multi-asset Bermudan: out-of-sample LSM lower bound +
    Andersen-Broadie dual upper bound (three independent path sets).

    On the Broadie-Glasserman 2-asset max-call this bracket contains the
    published [13.892, 13.934] interval (test-pinned).
    """
    if kind not in ("max", "min", "basket"):
        raise ValueError("kind must be 'max', 'min', or 'basket'")
    if len(engine.params_list) < 2:
        raise ValueError("multi-asset LSM needs >= 2 assets")
    if kind == "basket" and weights is None:
        raise ValueError("kind='basket' needs weights")
    w = (jnp.asarray(weights, jnp.float32) if weights is not None else None)
    r_num = float(engine.params_list[0].r)
    spots_a = jnp.asarray(spots, jnp.float32)
    k_train, k_eval, k_dual = jax.random.split(
        jax.random.key(engine.seed), 3)
    static = dict(n_ex=int(n_ex), steps_per_period=int(steps_per_period),
                  kind=kind, is_call=is_call)
    coefs = lsm_basket_train(
        engine._batch, spots_a, engine._chol, strike, T, r_num, k_train,
        num_paths=engine.num_paths, weights=w, **static)
    lo = jax.device_get(lsm_basket_lower_bound(
        engine._batch, spots_a, engine._chol, strike, T, r_num, k_eval,
        coefs["policy"], num_paths=engine.num_paths, weights=w, **static))
    hi = jax.device_get(dual_upper_bound_basket(
        engine._batch, spots_a, engine._chol, strike, T, r_num, k_dual,
        coefs["value"], n_outer=int(n_outer), n_inner=int(n_inner),
        weights=w, **static))
    payoff = _ma_payoff_fn(jnp.float32(strike), kind, is_call,
                           w if w is not None else jnp.full(
                               (len(engine.params_list),),
                               1.0 / len(engine.params_list), jnp.float32))
    intrinsic = float(payoff(spots_a[:, None])[0])
    lower = max(float(lo["price"]), intrinsic)
    upper = float(hi["price"])
    return {
        "lower_bound": lower,
        "lower_se": float(lo["std_error"]),
        "upper_bound": upper,
        "upper_se": float(hi["std_error"]),
        "duality_gap": upper - lower,
        "price": 0.5 * (lower + upper),
        "n_exercise": int(n_ex),
        "n_outer": int(n_outer),
        "n_inner": int(n_inner),
    }
