"""Mesh-sharded drivers for every remaining MC model family.

Round-5 closure of the sharding axis (SURVEY.md §5.8 — the reference's one
parallelism axis, paths, made first-class across the WHOLE engine surface):
each driver here is a thin payoff function + `sharded_moments` call; the
shard_map / key-folding / psum / pooling shape lives exactly once in
`mcos_tpu.parallel.mesh.sharded_moments`. Families covered here: SVCJ,
Lévy (VG + NIG), lifted rough Heston, Dupire local vol, cliquet /
forward-start, quanto, worst-of autocallable notes, variance swaps, and
(moved from mesh.py in the same refactor) rough Bergomi, Heston-Hull-
White, SLV particles, time-dependent SVJ, and multi-asset SVJ baskets.
The single-device estimator each driver must reproduce on the pooled
union sample is cited per function; tests/test_parallel.py pins every
driver to its single-device engine.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from mcos_tpu.models.params import SVCJParams, SVJParams
from mcos_tpu.ops import simulate
from mcos_tpu.ops.bs import bs_price
from mcos_tpu.parallel.mesh import pool_moments, sharded_moments

Array = jax.Array


def _ppd(mesh: Mesh, num_paths: int, axis_name: str) -> int:
    return -(-int(num_paths) // mesh.shape[axis_name])


# ─────────────────────────────────────────────────────────────────────────────
# SVCJ (correlated price/variance jumps)
# ─────────────────────────────────────────────────────────────────────────────
def _svcj_local_payoffs(dev_key, params, spot, strikes, T, *,
                        ppd, num_steps, is_call):
    """β=1 companion-CV effective payoffs — the estimator of
    engine/svcj.py:_svcj_price_core on this device's key-folded slice."""
    from mcos_tpu.ops.svcj import svcj_terminal

    s, v, g = svcj_terminal(params, spot, T, dev_key, num_paths=ppd,
                            num_steps=num_steps, antithetic=True,
                            companion=True)
    sign = 1.0 if is_call else -1.0
    pay = jnp.maximum(sign * (s[..., None] - strikes), 0.0)
    g_pay = jnp.maximum(sign * (g[..., None] - strikes), 0.0)
    discount = jnp.exp(-params.r * jnp.asarray(T, jnp.float32))
    bs_ref = bs_price(spot, strikes, T, params.r, params.q,
                      jnp.sqrt(params.v0), is_call)
    eff = jnp.mean(pay - g_pay, axis=0) + bs_ref / discount  # (ppd, K)
    aux = {"v_max": jnp.max(v),
           "nonfinite": jnp.sum(~jnp.isfinite(s)).astype(jnp.float32)}
    return eff.T, None, aux


def sharded_svcj_price(params: SVCJParams, spot, strikes, T, key, *,
                       mesh: Mesh, num_paths: int, num_steps: int,
                       is_call: bool = True,
                       axis_name: str = "paths") -> Dict[str, Array]:
    """Mesh-sharded SVCJ pricing (psum'd CV-effective moments)."""
    ppd = _ppd(mesh, num_paths, axis_name)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    stats = sharded_moments(
        _svcj_local_payoffs, key,
        (params, jnp.float32(spot), strikes, jnp.float32(T)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps),
                 ("is_call", is_call)))
    discount = jnp.exp(-jnp.asarray(params.r, jnp.float32)
                       * jnp.asarray(T, jnp.float32))
    out = pool_moments(stats, discount)
    out["frac_nonfinite"] = stats["nonfinite"] / (2.0 * stats["n"])
    return out


# ─────────────────────────────────────────────────────────────────────────────
# Lévy: variance gamma + normal inverse Gaussian (exact terminal samplers)
# ─────────────────────────────────────────────────────────────────────────────
def _vg_local_payoffs(dev_key, p, spot, strikes, T, *, ppd, is_call):
    """Per-device VG payoffs (exact sampler, ops/levy.py:vg_terminal)."""
    from mcos_tpu.ops.levy import vg_terminal

    s = vg_terminal(p, spot, T, dev_key, num_paths=ppd)      # (2, ppd)
    phi = 1.0 if is_call else -1.0
    pay = jnp.maximum(phi * (s[..., None] - strikes), 0.0)
    return jnp.mean(pay, axis=0).T                           # (K, ppd)


def _nig_local_payoffs(dev_key, p, spot, strikes, T, *, ppd, is_call):
    """Per-device NIG payoffs (exact sampler, ops/levy.py:nig_terminal)."""
    from mcos_tpu.ops.levy import nig_terminal

    s = nig_terminal(p, spot, T, dev_key, num_paths=ppd)
    phi = 1.0 if is_call else -1.0
    pay = jnp.maximum(phi * (s[..., None] - strikes), 0.0)
    return jnp.mean(pay, axis=0).T


def sharded_levy_price(p, spot, strikes, T, key, *, mesh: Mesh,
                       num_paths: int, is_call: bool = True,
                       axis_name: str = "paths") -> Dict[str, Array]:
    """Mesh-sharded Lévy pricing; the model is inferred from the params
    type (VGParams / NIGParams — both are single-shot exact samplers, so
    there is no step axis to scale, only paths)."""
    from mcos_tpu.ops.levy import NIGParams, VGParams

    if isinstance(p, VGParams):
        local = _vg_local_payoffs
    elif isinstance(p, NIGParams):
        local = _nig_local_payoffs
    else:
        raise TypeError(f"unsupported Lévy params: {type(p).__name__}")
    ppd = _ppd(mesh, num_paths, axis_name)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    stats = sharded_moments(
        local, key, (p, jnp.float32(spot), strikes, jnp.float32(T)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("is_call", is_call)))
    discount = jnp.exp(-jnp.asarray(p.r, jnp.float32)
                       * jnp.asarray(T, jnp.float32))
    return pool_moments(stats, discount)


# ─────────────────────────────────────────────────────────────────────────────
# Lifted rough Heston (multi-factor Markovian lift MC)
# ─────────────────────────────────────────────────────────────────────────────
def _rheston_local_payoffs(dev_key, params, spot, strikes, T, c, x, *,
                           ppd, num_steps, is_call):
    """β=1 companion-CV effective payoffs — the estimator of
    engine/roughheston.py:_rh_price_core on this device's slice."""
    from mcos_tpu.ops.roughheston import lifted_terminal

    s, v, g = lifted_terminal(params, spot, T, dev_key, c, x,
                              num_paths=ppd, num_steps=num_steps,
                              antithetic=True, companion=True)
    sign = 1.0 if is_call else -1.0
    pay = jnp.maximum(sign * (s[..., None] - strikes), 0.0)
    g_pay = jnp.maximum(sign * (g[..., None] - strikes), 0.0)
    discount = jnp.exp(-params.r * jnp.asarray(T, jnp.float32))
    bs_ref = bs_price(spot, strikes, T, params.r, params.q,
                      jnp.sqrt(params.v0), is_call)
    eff = jnp.mean(pay - g_pay, axis=0) + bs_ref / discount
    aux = {"v_max": jnp.max(v),
           "nonfinite": jnp.sum(~jnp.isfinite(s)).astype(jnp.float32)}
    return eff.T, None, aux


def sharded_roughheston_price(params, spot, strikes, T, key, *,
                              mesh: Mesh, num_paths: int, num_steps: int,
                              n_factors: int = 24,
                              axis_name: str = "paths",
                              is_call: bool = True) -> Dict[str, Array]:
    """Mesh-sharded lifted rough-Heston MC (the kernel nodes are
    replicated static data; the factor-scan paths are what scale)."""
    from mcos_tpu.engine.roughheston import _nodes

    ppd = _ppd(mesh, num_paths, axis_name)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    c, x = _nodes(params, float(T), n_factors)
    stats = sharded_moments(
        _rheston_local_payoffs, key,
        (params, jnp.float32(spot), strikes, jnp.float32(T), c, x),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps),
                 ("is_call", is_call)))
    discount = jnp.exp(-jnp.asarray(params.r, jnp.float32)
                       * jnp.asarray(T, jnp.float32))
    out = pool_moments(stats, discount)
    out["frac_nonfinite"] = stats["nonfinite"] / (2.0 * stats["n"])
    return out


# ─────────────────────────────────────────────────────────────────────────────
# Dupire local vol
# ─────────────────────────────────────────────────────────────────────────────
def _localvol_local_payoffs(dev_key, var_rows, t_mid, y0, dy, spot,
                            strikes, T, r, q, *, ppd, num_steps, is_call):
    """Per-device local-vol payoffs (engine/localvol.py:price_batch
    estimator: antithetic pairs collapsed, no CV)."""
    from mcos_tpu.engine.localvol import simulate_terminal_localvol

    s = simulate_terminal_localvol(
        var_rows, t_mid, y0, dy, spot, r, q, T, dev_key,
        num_paths=ppd, num_steps=num_steps)                  # (2, ppd)
    pay = simulate.vanilla_payoff(
        s[None], strikes[:, None, None], is_call)
    return simulate.combine_antithetic(jnp.swapaxes(pay, 0, 1))


def sharded_localvol_price(surface, spot, strikes, T, key, *, mesh: Mesh,
                           num_paths: int, num_steps: int,
                           is_call: bool = True,
                           axis_name: str = "paths") -> Dict[str, Array]:
    """Mesh-sharded Dupire local-vol pricing. `surface` is a
    `LocalVolSurface`; its per-step variance tables are replicated (a few
    hundred KB) and the path scan shards."""
    rows, t_mid = surface.step_tables(float(T), num_steps)
    ppd = _ppd(mesh, num_paths, axis_name)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    stats = sharded_moments(
        _localvol_local_payoffs, key,
        (jnp.asarray(rows, jnp.float32), jnp.asarray(t_mid, jnp.float32),
         jnp.float32(surface.y_grid[0]),
         jnp.float32(surface.y_grid[1] - surface.y_grid[0]),
         jnp.float32(spot), strikes, jnp.float32(T),
         jnp.float32(surface.r), jnp.float32(surface.q)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps),
                 ("is_call", is_call)))
    discount = jnp.exp(-jnp.float32(surface.r) * jnp.float32(T))
    return pool_moments(stats, discount)


# ─────────────────────────────────────────────────────────────────────────────
# Cliquet (clipped-sum of period returns, optimal-β exact companion CV)
# ─────────────────────────────────────────────────────────────────────────────
def _cliquet_local_payoffs(dev_key, params, T, *, ppd, n_periods,
                           steps_per_period, local_floor, local_cap,
                           global_floor, global_cap, notional,
                           control_variate):
    """(pay, ctrl) per device — engine/cliquet.py:price_cliquet algebra:
    the control is the UNCAPPED-sum cliquet on the companion legs (exact
    closed form `cliquet_bs`; the global clip only weakens correlation)."""
    from mcos_tpu.engine.cliquet import (_cliquet_payoff,
                                         simulate_period_log_returns)

    dlog_s, dlog_g = simulate_period_log_returns(
        params, T, dev_key, num_paths=ppd, n_periods=n_periods,
        steps_per_period=steps_per_period, companion=control_variate)
    pay = notional * _cliquet_payoff(dlog_s, local_floor, local_cap,
                                     global_floor, global_cap)
    if not control_variate:
        return pay
    ctrl = notional * _cliquet_payoff(dlog_g, local_floor, local_cap,
                                      -np.inf, np.inf)
    return pay, ctrl, {}


def sharded_cliquet_price(params: SVJParams, T, key, *, mesh: Mesh,
                          num_paths: int, n_periods: int = 4,
                          steps_per_period: int = 16,
                          local_floor: float = 0.0,
                          local_cap: float = 0.08,
                          global_floor: float = 0.0,
                          global_cap: float = float("inf"),
                          notional: float = 1.0,
                          control_variate: bool = True,
                          axis_name: str = "paths") -> Dict[str, Array]:
    """Mesh-sharded cliquet pricing with the pooled optimal-β CV."""
    from mcos_tpu.engine.cliquet import cliquet_bs

    ppd = _ppd(mesh, num_paths, axis_name)
    stats = sharded_moments(
        _cliquet_local_payoffs, key, (params, jnp.float32(T)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("n_periods", n_periods),
                 ("steps_per_period", steps_per_period),
                 ("local_floor", float(local_floor)),
                 ("local_cap", float(local_cap)),
                 ("global_floor", float(global_floor)),
                 ("global_cap", float(global_cap)),
                 ("notional", float(notional)),
                 ("control_variate", control_variate)))
    discount = float(np.exp(-float(params.r) * float(T)))
    ctrl_exact = None
    if control_variate:
        ctrl_exact = cliquet_bs(
            float(T), n_periods, float(params.r), float(params.q),
            float(np.sqrt(float(params.v0))), float(local_floor),
            float(local_cap), float(notional)) / discount
    return pool_moments(stats, discount, ctrl_exact=ctrl_exact)


# ─────────────────────────────────────────────────────────────────────────────
# Quanto (domestic-measure SVJ with FX drift tilt)
# ─────────────────────────────────────────────────────────────────────────────
def _quanto_local_payoffs(dev_key, params, spot, strike, T, r_d, sigma_fx,
                          rho_fx, *, ppd, num_steps, is_call,
                          control_variate):
    """(pay, ctrl) per device — engine/quanto.py:price estimator (the
    companion control's exact expectation is the closed-form quanto-BS)."""
    from mcos_tpu.engine.quanto import _quanto_terminal

    s, g = _quanto_terminal(params, spot, T, r_d, sigma_fx, rho_fx,
                            dev_key, num_paths=ppd, num_steps=num_steps)
    phi = 1.0 if is_call else -1.0
    pay = simulate.combine_antithetic(jnp.maximum(phi * (s - strike), 0.0))
    if not control_variate:
        return pay
    ctrl = simulate.combine_antithetic(
        jnp.maximum(phi * (g - strike), 0.0))
    return pay, ctrl, {}


def sharded_quanto_price(params: SVJParams, r_domestic: float,
                         sigma_fx: float, rho_fx: float, spot, strike, T,
                         key, *, mesh: Mesh, num_paths: int,
                         num_steps: int, is_call: bool = True,
                         control_variate: bool = True, fx_fixed: float = 1.0,
                         axis_name: str = "paths") -> Dict[str, Array]:
    """Mesh-sharded quanto vanilla with the pooled optimal-β CV."""
    from mcos_tpu.engine.quanto import quanto_bs

    ppd = _ppd(mesh, num_paths, axis_name)
    stats = sharded_moments(
        _quanto_local_payoffs, key,
        (params, jnp.float32(spot), jnp.float32(strike), jnp.float32(T),
         jnp.float32(r_domestic), jnp.float32(sigma_fx),
         jnp.float32(rho_fx)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps),
                 ("is_call", is_call),
                 ("control_variate", control_variate)))
    disc = float(np.exp(-float(r_domestic) * float(T)))
    ctrl_exact = None
    if control_variate:
        ctrl_exact = quanto_bs(
            float(spot), float(strike), float(T), float(r_domestic),
            float(params.r), float(params.q),
            float(np.sqrt(float(params.v0))), float(sigma_fx),
            float(rho_fx), is_call) / disc
    out = pool_moments(stats, disc, ctrl_exact=ctrl_exact)
    out["price"] = out["price"] * fx_fixed
    out["std_error"] = out["std_error"] * fx_fixed
    return out


# ─────────────────────────────────────────────────────────────────────────────
# Worst-of autocallable note
# ─────────────────────────────────────────────────────────────────────────────
def _worstof_note_payoffs(dev_key, batch, chol, T, r, *, ppd, n_assets,
                          n_obs, steps_per_period, autocall_barrier,
                          coupon_barrier, protection_barrier, coupon,
                          final_coupon, notional):
    """Per-device discounted note values on the worst performer — the
    payoff algebra is engine/autocallable.py:_note_path_values itself
    (one shared function, per the repo's twin discipline)."""
    from mcos_tpu.engine.autocallable import _note_path_values
    from mcos_tpu.engine.basket import simulate_basket_observations

    levels = simulate_basket_observations(
        batch, jnp.ones((n_assets,), jnp.float32), chol, T, dev_key,
        num_paths=ppd, n_obs=n_obs, steps_per_period=steps_per_period)
    worst = jnp.min(levels, axis=2)                 # (m, 2, ppd)
    pay, (ever, first, r_T, _) = _note_path_values(
        worst, T, r, n_obs, autocall_barrier, coupon_barrier,
        protection_barrier, coupon, final_coupon, notional)
    # Redemption accounting pooled as psum'd COUNTS over all 2·n branch
    # paths (engine/autocallable.py:_note_value's one_hot means, exactly).
    oh = jax.nn.one_hot(first, n_obs) * ever[..., None]      # (2, ppd, m)
    aux = {"call_counts": jnp.sum(oh, axis=(0, 1)),          # (m,)
           "loss_count": jnp.sum(
               (~ever & (r_T < protection_barrier)).astype(jnp.float32)),
           "branch_paths": jnp.float32(2 * ever.shape[-1])}
    return pay, None, aux


def sharded_worstof_autocall(engine, T, key, *, mesh: Mesh,
                             num_paths=None, n_obs: int = 4,
                             autocall_barrier: float = 1.0,
                             coupon_barrier: float = 0.8,
                             protection_barrier: float = 0.7,
                             coupon: float = 0.02,
                             final_coupon=None, notional: float = 1.0,
                             axis_name: str = "paths") -> Dict[str, Array]:
    """Mesh-sharded worst-of autocallable note value. `engine` is a
    `WorstOfAutocallableEngine` (holds the stacked params pytree and the
    jitter-stabilized correlation Cholesky)."""
    if final_coupon is None:
        final_coupon = n_obs * coupon
    n_total = int(num_paths if num_paths is not None else engine.num_paths)
    ppd = _ppd(mesh, n_total, axis_name)
    stats = sharded_moments(
        _worstof_note_payoffs, key,
        (engine.params_batch, engine.corr_chol, jnp.float32(T),
         jnp.float32(engine.r)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("n_assets", engine.n_assets),
                 ("n_obs", n_obs),
                 ("steps_per_period", engine.steps_per_period),
                 ("autocall_barrier", float(autocall_barrier)),
                 ("coupon_barrier", float(coupon_barrier)),
                 ("protection_barrier", float(protection_barrier)),
                 ("coupon", float(coupon)),
                 ("final_coupon", float(final_coupon)),
                 ("notional", float(notional))))
    out = pool_moments(stats)          # note values are path-discounted
    # Pooled redemption accounting (the _note_value keys, union-sample).
    bp = np.asarray(stats["branch_paths"], np.float64)
    first_call = np.asarray(stats["call_counts"], np.float64) / bp
    dts = float(T) / n_obs * np.arange(1, n_obs + 1, dtype=np.float64)
    out["call_prob_by_date"] = first_call.tolist()
    out["survival_prob"] = float(1.0 - first_call.sum())
    out["loss_prob"] = float(stats["loss_count"]) / float(bp)
    out["expected_life"] = float((first_call * dts).sum()
                                 + (1.0 - first_call.sum()) * float(T))
    out["n_obs"] = n_obs
    out["n_assets"] = engine.n_assets
    return out


# ─────────────────────────────────────────────────────────────────────────────
# Variance swap (realized-variance leg)
# ─────────────────────────────────────────────────────────────────────────────
def _varswap_local_payoffs(dev_key, params, T, *, ppd, num_steps):
    """Per-device annualized realized-variance pair means — the MC leg of
    engine/volderivs.py:variance_swap (pairs collapsed before moments:
    branches share jump uniforms and z² magnitudes)."""
    from mcos_tpu.engine.volderivs import realized_variance_paths

    rv = realized_variance_paths(params, T, dev_key, num_paths=ppd,
                                 num_steps=num_steps)
    return jnp.mean(rv, axis=0)                      # (ppd,)


def sharded_variance_swap(params: SVJParams, T, key, *, mesh: Mesh,
                          num_paths: int, num_steps: int,
                          axis_name: str = "paths") -> Dict[str, object]:
    """Mesh-sharded variance-swap fair strike (MC) + the closed form."""
    from mcos_tpu.engine.volderivs import variance_swap_fair_strike

    ppd = _ppd(mesh, num_paths, axis_name)
    stats = sharded_moments(
        _varswap_local_payoffs, key, (params, jnp.float32(T)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps)))
    pooled = pool_moments(stats)
    closed = variance_swap_fair_strike(params, float(T))
    mc = float(pooled["price"])
    se = float(pooled["std_error"])
    return {
        **closed,
        "mc_fair_variance": mc,
        "mc_std_error": se,
        "mc_vs_closed_sigmas": float(
            abs(mc - closed["fair_variance"]) / max(se, 1e-12)),
        "num_paths_used": float(pooled["num_paths_used"]),
    }

# ─────────────────────────────────────────────────────────────────────────────
# Families converted onto the combinator in the same refactor (these lived
# as hand-written shard_map wrappers in parallel/mesh.py through round 4;
# mesh.py now keeps only the infrastructure and the genuinely different
# programs — regression/tail/batch pooling shapes).
# ─────────────────────────────────────────────────────────────────────────────
def _rough_local_payoffs(dev_key, params, spot, strikes, T, chol, *,
                         ppd, num_steps, is_call):
    """Per-device rough Bergomi conditional-Black payoffs, (K, ppd)."""
    from mcos_tpu.ops.rough import rbergomi_conditional_payoffs

    pay = rbergomi_conditional_payoffs(
        params, spot, strikes, T, chol, dev_key, num_paths=ppd,
        num_steps=num_steps, is_call=is_call)
    return jnp.mean(pay, axis=0).T               # antithetic combine


def sharded_rough_price(
    params,
    spot,
    strikes,
    T,
    key: Array,
    *,
    mesh: Mesh,
    num_paths: int,
    num_steps: int,
    is_call: bool = True,
    axis_name: str = "paths",
) -> Dict[str, Array]:
    """Mesh-sharded rough Bergomi pricing (conditional-Black estimator).

    The global path count splits over the `axis_name` axis; each device
    runs the exact-covariance sampler with a device-folded key (the
    Cholesky factor is replicated — a few MB of static data, the per-path
    draws are what scale); `sharded_moments` pools the per-strike triple.
    """
    from mcos_tpu.ops.rough import rbergomi_chol

    ppd = -(-num_paths // mesh.shape[axis_name])
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    chol = jnp.asarray(rbergomi_chol(float(params.hurst), float(T),
                                     num_steps))
    stats = sharded_moments(
        _rough_local_payoffs, key,
        (params, jnp.float32(spot), strikes, jnp.float32(T), chol),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps),
                 ("is_call", is_call)))
    discount = jnp.exp(-jnp.asarray(params.r, jnp.float32)
                       * jnp.asarray(T, jnp.float32))
    return pool_moments(stats, discount)

def sharded_hhw_price(
    hhw_params,
    spot,
    strikes,
    T,
    key: Array,
    *,
    mesh: Mesh,
    num_paths: int,
    num_steps: int,
    is_call: bool = True,
    axis_name: str = "paths",
) -> Dict[str, Array]:
    """Mesh-sharded Heston–Hull-White pricing.

    Per device: the joint (S, v, r) scan (ops/hhw.py:hhw_terminal — the
    left-point ∫r martingale scheme) on a device-folded key; pathwise-
    discounted payoffs pool via `sharded_moments` (discount=1 here — the
    stochastic-rate deflator is already inside each payoff).
    """
    ppd = -(-num_paths // mesh.shape[axis_name])
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    stats = sharded_moments(
        _hhw_local_payoffs, key,
        (hhw_params, jnp.float32(spot), strikes, jnp.float32(T)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps),
                 ("is_call", is_call)))
    return pool_moments(stats)


def _hhw_local_payoffs(dev_key, p, spot, strikes, T, *,
                       ppd, num_steps, is_call):
    """Per-device pathwise-discounted HHW payoffs, (K, ppd)."""
    from mcos_tpu.ops.hhw import hhw_terminal

    s, d = hhw_terminal(p, spot, T, dev_key, num_paths=ppd,
                        num_steps=num_steps)              # (2, ppd) each
    raw = (s[None] - strikes[:, None, None]) if is_call \
        else (strikes[:, None, None] - s[None])
    return simulate.combine_antithetic(
        (jnp.maximum(raw, 0.0) * d[None]).swapaxes(0, 1))


def sharded_slv_price(
    heston: SVJParams,
    var_rows,
    t_mid,
    y0,
    dy,
    spot,
    strikes,
    T,
    key: Array,
    *,
    mesh: Mesh,
    num_paths: int,
    num_steps: int,
    n_bins: int = 101,
    is_call: bool = True,
    axis_name: str = "paths",
) -> Dict[str, Array]:
    """Mesh-sharded SLV particle-method pricing.

    SLV is a McKean-Vlasov (mean-field) simulation: the leverage function
    at each step depends on E[v | S] over the WHOLE particle cloud. The
    sharded run therefore psums the per-step bin statistics inside the
    scan (engine/slv.py:slv_terminal axis_name plumbing) — one
    (n_bins+2)-word all-reduce per step over ICI — so N devices × ppd
    particles behave as ONE cloud of N·ppd particles, not N independent
    small clouds (small clouds noise-flatten the leverage surface).
    Terminal payoffs then pool via the usual psum'd moments.
    """
    ppd = -(-num_paths // mesh.shape[axis_name])
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    stats = sharded_moments(
        _slv_local_payoffs, key,
        (heston, jnp.asarray(var_rows, jnp.float32),
         jnp.asarray(t_mid, jnp.float32), jnp.float32(y0),
         jnp.float32(dy), jnp.float32(spot), strikes, jnp.float32(T)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps),
                 ("n_bins", n_bins), ("is_call", is_call),
                 ("axis_name", axis_name)))
    discount = jnp.exp(-jnp.asarray(heston.r, jnp.float32)
                       * jnp.asarray(T, jnp.float32))
    return pool_moments(stats, discount)


def _slv_local_payoffs(dev_key, heston, var_rows, t_mid, y0, dy, spot,
                       strikes, T, *, ppd, num_steps, n_bins, is_call,
                       axis_name):
    """Per-device SLV particle payoffs; the leverage conditioning psums
    bin statistics inside the scan (the one driver whose payoff fn itself
    talks to the mesh axis)."""
    from mcos_tpu.engine.slv import slv_terminal

    s = slv_terminal(heston, var_rows, t_mid, y0, dy, spot, T, dev_key,
                     num_paths=ppd, num_steps=num_steps, n_bins=n_bins,
                     axis_name=axis_name)                  # (2, ppd)
    raw = (s[None] - strikes[:, None, None]) if is_call \
        else (strikes[:, None, None] - s[None])
    return simulate.combine_antithetic(
        jnp.maximum(raw, 0.0).swapaxes(0, 1))              # (K, ppd)

def sharded_td_price(
    params: SVJParams,
    theta_t,
    xi_t,
    lam_t,
    spot,
    strikes,
    T,
    key: Array,
    *,
    mesh: Mesh,
    num_paths: int,
    num_steps: int,
    is_call: bool = True,
    control_variate: bool = True,
    axis_name: str = "paths",
) -> Dict[str, Array]:
    """Mesh-sharded pricing under time-dependent (θ, ξ, λ) dynamics.

    Same psum'd (n, Σ, Σ²) moment pooling as `sharded_price`; the per-step
    parameter arrays are replicated (a few KB) and every device simulates
    its own key-folded slice of the global path budget.
    """
    ppd = -(-num_paths // mesh.shape[axis_name])
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    stats = sharded_moments(
        _td_local_payoffs, key,
        (params, jnp.asarray(theta_t, jnp.float32),
         jnp.asarray(xi_t, jnp.float32), jnp.asarray(lam_t, jnp.float32),
         jnp.float32(spot), strikes, jnp.float32(T)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", num_steps),
                 ("is_call", is_call),
                 ("control_variate", control_variate)))
    discount = jnp.exp(-jnp.asarray(params.r, jnp.float32)
                       * jnp.asarray(T, jnp.float32))
    out = pool_moments(stats, discount)
    out["frac_nonfinite"] = stats["nonfinite"] / (2.0 * stats["n"])
    if control_variate:
        out["bs_ref"] = bs_price(spot, strikes, T, params.r, params.q,
                                 jnp.sqrt(params.v0), is_call)
    return out


def _td_local_payoffs(dev_key, params, th_t, xi_t, lam_t, spot, strikes,
                      T, *, ppd, num_steps, is_call, control_variate):
    """Per-device td-SVJ CV-effective payoffs (β=1 companion folded in),
    plus the guard diagnostics (v_max pmax / nonfinite psum)."""
    from mcos_tpu.ops.tdsvj import simulate_terminal_td

    s_final, v_final, g_final = simulate_terminal_td(
        params, th_t, xi_t, lam_t, spot, T, dev_key,
        num_paths=ppd, num_steps=num_steps, antithetic=True,
        companion=control_variate)
    pay = simulate.combine_antithetic(
        simulate.vanilla_payoff(
            s_final[None], strikes[:, None, None], is_call).swapaxes(0, 1))
    if control_variate:
        discount = jnp.exp(-params.r * T)
        bs_ref = bs_price(spot, strikes, T, params.r, params.q,
                          jnp.sqrt(params.v0), is_call)
        ctrl = simulate.combine_antithetic(
            simulate.vanilla_payoff(
                g_final[None], strikes[:, None, None],
                is_call).swapaxes(0, 1))
        eff = pay - (ctrl - bs_ref[:, None] / discount)
    else:
        eff = pay
    aux = {"v_max": jnp.max(v_final),
           "nonfinite": jnp.sum(~jnp.isfinite(s_final))
           .astype(jnp.float32)}
    return eff, None, aux

def _basket_local_payoffs(dev_key, batch, spots, chol, w, strike, T, *,
                          ppd, num_steps, is_call, use_cv):
    """Per-device basket (pay, ctrl) — the engine's own payoff/control
    algebra (engine/basket.py:basket_payoff_and_control) on a key-folded
    correlated-simulation slice; rides `sharded_moments`."""
    from mcos_tpu.engine.basket import (basket_payoff_and_control,
                                        simulate_basket_terminal)

    s, g = simulate_basket_terminal(
        batch, spots, chol, T, dev_key, num_paths=ppd,
        num_steps=num_steps, antithetic=True, companion=use_cv)
    pay, ctrl = basket_payoff_and_control(
        s, g, w, spots, strike, is_call, use_cv)
    return pay, ctrl, {}


def sharded_basket_price(
    engine,
    spots,
    weights,
    strike,
    T,
    key: Array,
    *,
    mesh: Mesh,
    num_paths: Optional[int] = None,
    is_call: bool = True,
    axis_name: str = "paths",
) -> Dict[str, float]:
    """Mesh-sharded multi-asset SVJ basket pricing.

    `engine` is a `BasketEngine` (holds the stacked per-asset params pytree
    and the jitter-stabilized correlation Cholesky); the A-asset correlated
    simulation runs per device on a key-folded slice of the global path
    budget, the payoff/control algebra is the engine's own
    `basket_payoff_and_control`, and the optimal-β control variate comes
    from the psum-pooled (n, Σp, Σp², Σc, Σc², Σpc) cross-moments — the
    single-device estimator evaluated on the union sample.
    """
    from mcos_tpu.config import scaled_steps

    n_total = int(num_paths if num_paths is not None else engine.num_paths)
    n_dev = mesh.shape[axis_name]
    ppd = -(-n_total // n_dev)
    steps = scaled_steps(engine.num_steps, T)
    use_cv = engine.use_control_variate

    stats = sharded_moments(
        _basket_local_payoffs, key,
        (engine._batch, jnp.asarray(spots, jnp.float32), engine._chol,
         jnp.asarray(weights, jnp.float32), jnp.float32(strike),
         jnp.float32(T)),
        mesh=mesh, axis_name=axis_name,
        statics=(("ppd", ppd), ("num_steps", steps),
                 ("is_call", is_call), ("use_cv", use_cv)))
    ctrl_exact = (engine._geo_ctrl_exact(spots, weights, strike, T, is_call)
                  if use_cv else None)
    r_eff = float(engine.params_list[0].r)
    discount = float(np.exp(-r_eff * T))
    pooled = pool_moments(stats, discount, ctrl_exact=ctrl_exact)
    out = {
        "price": float(pooled["price"]),
        "std_error": float(pooled["std_error"]),
        "num_paths_used": float(stats["n"]),
        "num_steps": steps,
        "num_devices": int(n_dev),
    }
    if "cv_beta" in pooled:
        out["cv_beta"] = float(pooled["cv_beta"])
    return out
