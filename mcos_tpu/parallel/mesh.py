"""Device-mesh parallelism: path-sharded Monte Carlo with psum reductions.

The reference's only parallelism is shared-memory threading over MC paths
(`prange(num_paths)`, engine/monte_carlo.py:221-222) — single process, no
distributed backend (SURVEY.md §5.8). The TPU-native equivalent built here:

- a `jax.sharding.Mesh` with a `"paths"` axis (optionally × `"batch"` for
  strike/contract data-parallelism),
- `shard_map` runs the per-device path simulation with a device-folded
  threefry key (no cross-device random reuse),
- the (count, Σpay, Σpay², ...) moment triple is reduced with `psum` over ICI,
  reproducing the single-chip price/stderr estimator bit-for-bit in
  expectation (monte_carlo.py:342-343 semantics),
- antithetic pairs and CRN stay device-local, so no resharding precedes the
  reduction.

Multi-slice scaling uses standard JAX multi-process initialization (the
`"paths"` axis spans slices over DCN); nothing here changes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mcos_tpu.models.params import SVJParams
from mcos_tpu.ops import simulate
from mcos_tpu.ops.bs import bs_price

Array = jax.Array


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "paths") -> Mesh:
    """1-D mesh over all (or given) devices for path-parallel MC."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def make_mesh_2d(batch: int, devices: Optional[Sequence] = None,
                 axis_names=("batch", "paths")) -> Mesh:
    """2-D mesh: contract/strike batch axis × path axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(batch, -1), axis_names)


def _local_price_stats(params, spot, strikes, T, key, *,
                       paths_per_device, num_steps, is_call, antithetic,
                       control_variate, cv_mode, axis_name, scheme="euler"):
    """Per-device path simulation + local moment sums (runs inside shard_map)."""
    idx = jax.lax.axis_index(axis_name)
    dev_key = jax.random.fold_in(key, idx)
    want_g = control_variate and cv_mode == "companion"
    sim = (simulate.simulate_terminal_qe if scheme == "qe"
           else simulate.simulate_terminal)
    s_final, v_final, g_final = sim(
        params, spot, T, dev_key,
        num_paths=paths_per_device, num_steps=num_steps,
        antithetic=antithetic, companion=want_g,
    )
    pay = simulate.combine_antithetic(
        simulate.vanilla_payoff(
            s_final[None], strikes[:, None, None], is_call).swapaxes(0, 1))

    if control_variate:
        discount = jnp.exp(-params.r * jnp.asarray(T, jnp.float32))
        sigma_bs = jnp.sqrt(params.v0)
        bs_ref = bs_price(spot, strikes, T, params.r, params.q, sigma_bs,
                          is_call)
        if cv_mode == "companion":
            ctrl = simulate.combine_antithetic(
                simulate.vanilla_payoff(
                    g_final[None], strikes[:, None, None], is_call
                ).swapaxes(0, 1))
        else:  # reference arithmetic (biased; parity only)
            ctrl = simulate.vanilla_payoff(
                s_final[0][None], strikes[:, None], is_call)
        eff = pay - (ctrl - bs_ref[:, None] / discount)
    else:
        eff = pay

    n_local = jnp.float32(eff.shape[-1])
    stats = {
        "n": n_local,
        "sum": jnp.sum(eff, axis=-1),
        "sumsq": jnp.sum(eff * eff, axis=-1),
        "v_max": jnp.max(v_final),
        "nonfinite": jnp.sum(~jnp.isfinite(s_final)).astype(jnp.float32),
    }
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), stats)


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

    Same shape as `sharded_price`: the global path count splits over the
    `axis_name` axis, each device runs the exact-covariance sampler with a
    device-folded key (the Cholesky factor is replicated — it is a few MB
    of static data, the per-path draws are what scale), and the per-strike
    (n, Σ, Σ²) moments psum over ICI.
    """
    from mcos_tpu.ops.rough import (rbergomi_chol,
                                    rbergomi_conditional_payoffs)

    n_dev = mesh.shape[axis_name]
    paths_per_device = -(-num_paths // n_dev)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    chol = jnp.asarray(rbergomi_chol(float(params.hurst), float(T),
                                     num_steps))

    def local(p, s0, ks, t, c, k):
        idx = jax.lax.axis_index(axis_name)
        dev_key = jax.random.fold_in(k, idx)
        pay = rbergomi_conditional_payoffs(
            p, s0, ks, t, c, dev_key, num_paths=paths_per_device,
            num_steps=num_steps, is_call=is_call)
        eff = jnp.mean(pay, axis=0)                 # antithetic combine
        stats = {
            "n": jnp.float32(eff.shape[0]),
            "sum": jnp.sum(eff, axis=0),
            "sumsq": jnp.sum(eff * eff, axis=0),
        }
        return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), stats)

    spec = P()
    shmapped = jax.shard_map(local, mesh=mesh,
                             in_specs=(spec,) * 6, out_specs=spec,
                             check_vma=False)
    stats = jax.jit(shmapped)(params, jnp.float32(spot), strikes,
                              jnp.float32(T), chol, key)
    discount = jnp.exp(-jnp.asarray(params.r, jnp.float32)
                       * jnp.asarray(T, jnp.float32))
    n = stats["n"]
    mean = stats["sum"] / n
    var = jnp.maximum(stats["sumsq"] / n - mean * mean, 0.0)
    return {
        "price": discount * mean,
        "std_error": discount * jnp.sqrt(var / n),
        "num_paths_used": n,
    }


def sharded_portfolio_returns(
    spots,
    sigmas,
    corr,
    weights,
    T,
    key: Array,
    *,
    mesh: Mesh,
    num_paths: int,
    num_steps: int,
    r: float,
    q: float,
    tail_quota: int,
    axis_name: str = "paths",
) -> Dict[str, Array]:
    """Correlated-GBM portfolio returns, path-sharded, with a distributed
    exact-tail reduction.

    Per device: simulate `num_paths / n_dev` paths (device-folded key), form
    portfolio returns, psum the raw moment sums, and contribute its local
    worst `tail_quota` returns via all_gather. The global worst-k order
    statistics (k ≤ tail_quota) are a subset of the union of per-device
    worst-`tail_quota` sets whenever no single device holds more than
    `tail_quota` of them — guaranteed when tail_quota ≥ k, and true with
    overwhelming probability for tail_quota ≳ 1.5·k/n_dev + O(√k) under iid
    sampling (the caller sizes the quota; see risk.portfolio_var).

    Returns replicated arrays: n, sum1..sum4 (raw moment sums) and
    `tail` — the (n_dev · tail_quota,) gathered worst returns.
    """
    from mcos_tpu.engine.risk import multi_asset_gbm_terminal

    n_dev = mesh.shape[axis_name]
    paths_per_device = -(-num_paths // n_dev)
    quota = min(tail_quota, paths_per_device)

    def local(spots_, sigmas_, corr_, weights_, T_, key_):
        idx = jax.lax.axis_index(axis_name)
        dev_key = jax.random.fold_in(key_, idx)
        s_t = multi_asset_gbm_terminal(
            spots_, sigmas_, corr_, r, q, T_, dev_key,
            num_paths=paths_per_device, num_steps=num_steps)
        rel = s_t / spots_[None, :] - 1.0
        returns = rel @ weights_

        n = jnp.float32(returns.shape[0])
        sums = {
            "n": n,
            "sum1": jnp.mean(returns) * n,       # pairwise-accurate means
            "sum2": jnp.mean(returns**2) * n,
            "sum3": jnp.mean(returns**3) * n,
            "sum4": jnp.mean(returns**4) * n,
        }
        sums = jax.tree.map(lambda x: jax.lax.psum(x, axis_name), sums)
        # Local worst `quota` returns (most negative first), then gather.
        worst = -jax.lax.top_k(-returns, quota)[0]
        sums["tail"] = jax.lax.all_gather(
            worst, axis_name, tiled=True)
        return sums

    spec = P()
    shmapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(shmapped)(
        jnp.asarray(spots, jnp.float32), jnp.asarray(sigmas, jnp.float32),
        jnp.asarray(corr, jnp.float32), jnp.asarray(weights, jnp.float32),
        jnp.float32(T), key)


def sharded_price(
    params: SVJParams,
    spot,
    strikes,
    T,
    key: Array,
    *,
    mesh: Mesh,
    num_paths: int,
    num_steps: int,
    is_call: bool = True,
    antithetic: bool = True,
    control_variate: bool = True,
    cv_mode: str = "companion",
    scheme: str = "euler",
    axis_name: str = "paths",
) -> Dict[str, Array]:
    """Mesh-sharded European pricing; same estimator as `mc_price_core`.

    `num_paths` is the *global* path count; it is split evenly over the
    `axis_name` mesh axis (rounded up to a device multiple).
    """
    n_dev = mesh.shape[axis_name]
    paths_per_device = -(-num_paths // n_dev)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))

    local = partial(
        _local_price_stats,
        paths_per_device=paths_per_device, num_steps=num_steps,
        is_call=is_call, antithetic=antithetic,
        control_variate=control_variate, cv_mode=cv_mode, scheme=scheme,
        axis_name=axis_name,
    )
    # Everything is replicated in; reductions produce replicated outputs.
    spec = P()
    shmapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    stats = jax.jit(shmapped)(
        params, jnp.float32(spot), strikes, jnp.float32(T), key)

    discount = jnp.exp(-jnp.asarray(params.r, jnp.float32)
                       * jnp.asarray(T, jnp.float32))
    n = stats["n"]
    mean = stats["sum"] / n
    var = jnp.maximum(stats["sumsq"] / n - mean * mean, 0.0)
    out = {
        "price": discount * mean,
        "std_error": discount * jnp.sqrt(var / n),
        "num_paths_used": n,
        "v_max": stats["v_max"],
        "frac_nonfinite": stats["nonfinite"] / n,
    }
    if control_variate:
        # eff already includes +bs_ref/discount, so `price` is the CV price.
        out["bs_ref"] = bs_price(spot, strikes, T, params.r, params.q,
                                 jnp.sqrt(params.v0), is_call)
    return out
