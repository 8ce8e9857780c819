r"""Crank-Nicolson PDE pricer — the framework's second numerical method.

Capability beyond the reference (Monte Carlo only): a deterministic
finite-difference engine for the Black-Scholes / Dupire-local-vol PDE

    V_t + 1/2 sig(x,t)^2 V_xx + (r - q - 1/2 sig^2) V_x - r V = 0,

in log-spot x, backward from the payoff. It serves as an *independent
cross-check* on every MC price (different discretization, different error
structure — disagreement localizes bugs that two MC runs sharing a kernel
cannot see) and prices American exercise without regression noise.

TPU design: one `lax.scan` over time steps whose body is a single
`jax.lax.linalg.tridiagonal_solve` — the XLA-native O(n) solver — on the
(n_x,) grid; there is no assembly loop, the three diagonals are closed
forms. Theta-scheme with Rannacher start-up (the first two steps run
fully implicit to damp the payoff-kink oscillation Crank-Nicolson is
famous for), Dirichlet boundaries from the discounted asymptotics, and
American exercise by projection (max against intrinsic after each step).
Delta and gamma come from central differences of the final grid — one
solve yields price AND spatial Greeks for every spot on the grid.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.lax.linalg import tridiagonal_solve

from mcos_tpu.config import DIVIDEND_YIELD, RISK_FREE_RATE

Array = jax.Array


@partial(jax.jit, static_argnames=("n_x", "n_t", "is_call", "american"))
def _cn_solve(sig2_grid, strike, T, r, q, x_grid, div_shift, *,
              n_x: int, n_t: int, is_call: bool, american: bool) -> Array:
    """Backward theta-scheme on the log-spot grid; returns V(t=0, x).

    sig2_grid: (n_t, n_x) local variance at each (time-step, node) — a
    constant array for Black-Scholes, the Dupire table for local vol.
    Time index 0 is the step nearest maturity (backward order).

    div_shift: (n_t,) per-step log-shift for discrete PROPORTIONAL
    dividends. When step k's interval contains an ex-date with fraction
    d, div_shift[k] = log(1 - d) and the jump condition
    V(t⁻, x) = V(t⁺, x + log(1-d)) is applied by linear interpolation on
    the grid (zero entries are a no-op).
    """
    dtype = jnp.float32
    dt = jnp.asarray(T, dtype) / n_t
    dx = x_grid[1] - x_grid[0]
    s_grid = jnp.exp(x_grid)
    phi = 1.0 if is_call else -1.0
    intrinsic = jnp.maximum(phi * (s_grid - strike), 0.0)

    def diagonals(sig2, theta_dt):
        """(sub, diag, super) of I - theta_dt * L on interior ordering."""
        a = 0.5 * sig2 / dx**2                       # V_xx coefficient
        b = (r - q - 0.5 * sig2) / (2.0 * dx)        # V_x coefficient
        lo = theta_dt * (a - b)                      # sub-diagonal of L
        mid = theta_dt * (-2.0 * a - r)              # diagonal of L
        hi = theta_dt * (a + b)                      # super-diagonal of L
        return -lo, 1.0 - mid, -hi

    def apply_explicit(v, sig2, theta_dt):
        """(I + theta_dt * L) v with one-sided zero-padding (boundaries
        are overwritten by the Dirichlet values afterwards)."""
        a = 0.5 * sig2 / dx**2
        b = (r - q - 0.5 * sig2) / (2.0 * dx)
        v_m = jnp.roll(v, 1)
        v_p = jnp.roll(v, -1)
        lv = (a - b) * v_m + (-2.0 * a - r) * v + (a + b) * v_p
        return v + theta_dt * lv

    def boundaries(tau):
        """Dirichlet values at x_min / x_max from discounted asymptotics."""
        disc_r = jnp.exp(-r * tau)
        disc_q = jnp.exp(-q * tau)
        if is_call:
            return jnp.float32(0.0), s_grid[-1] * disc_q - strike * disc_r
        return strike * disc_r - s_grid[0] * disc_q, jnp.float32(0.0)

    def step(v, inputs):
        k, sig2, dshift = inputs
        # Rannacher: two fully-implicit start-up steps, then CN.
        theta_im = jnp.where(k < 2, 1.0, 0.5) * dt
        theta_ex = dt - theta_im
        rhs = apply_explicit(v, sig2, theta_ex)
        tau = (k + 1.0) * dt                        # time to maturity
        lo_bc, hi_bc = boundaries(tau)
        sub, diag, sup = diagonals(sig2, theta_im)
        # Dirichlet rows: identity on the first/last node.
        diag = diag.at[0].set(1.0).at[-1].set(1.0)
        sub = sub.at[0].set(0.0).at[-1].set(0.0)
        sup = sup.at[0].set(0.0).at[-1].set(0.0)
        rhs = rhs.at[0].set(lo_bc).at[-1].set(hi_bc)
        v_new = tridiagonal_solve(sub, diag, sup, rhs[:, None])[:, 0]
        # Discrete-dividend jump condition (no-op where dshift == 0):
        # crossing the ex-date backwards, V(t⁻, x) = V(t⁺, x + log(1-d)).
        v_new = jnp.where(
            dshift != 0.0,
            jnp.interp(x_grid + dshift, x_grid, v_new), v_new)
        if american:
            # Early-exercise boundary at this time-to-maturity: the edge
            # of the region where continuation < intrinsic (projection
            # binding). Puts exercise below s*, calls above; ±inf encodes
            # "no exercise anywhere" (→ NaN on the host).
            binding = (v_new < intrinsic) & (intrinsic > 0.0)
            if is_call:
                s_star = jnp.min(jnp.where(binding, s_grid, jnp.inf))
            else:
                s_star = jnp.max(jnp.where(binding, s_grid, -jnp.inf))
            v_new = jnp.maximum(v_new, intrinsic)
        else:
            s_star = jnp.float32(jnp.nan)
        return v_new, s_star

    v0 = intrinsic
    v, s_stars = jax.lax.scan(step, v0,
                              (jnp.arange(n_t, dtype=dtype), sig2_grid,
                               div_shift))
    return v, s_stars


class PDEEngine:
    """Crank-Nicolson pricer for European/American vanillas under
    Black-Scholes or a Dupire local-vol surface."""

    def __init__(self, sigma: Optional[float] = None, localvol=None,
                 r: float = RISK_FREE_RATE, q: float = DIVIDEND_YIELD,
                 n_x: int = 401, n_t: int = 256, x_span: float = 4.0):
        """Either a flat `sigma` or a `LocalVolSurface` (engine/localvol)."""
        if (sigma is None) == (localvol is None):
            raise ValueError("pass exactly one of sigma / localvol")
        self.sigma = None if sigma is None else float(sigma)
        self.localvol = localvol
        self.r = float(r if localvol is None else localvol.r)
        self.q = float(q if localvol is None else localvol.q)
        self.n_x = int(n_x)
        self.n_t = int(n_t)
        self.x_span = float(x_span)

    def _grids(self, spot: float, strike: float, T: float):
        # Center the grid between spot and strike; span ±x_span vol-stds.
        sig0 = self.sigma if self.sigma is not None else float(
            np.sqrt(np.median(self.localvol.local_var)))
        center = 0.5 * (np.log(spot) + np.log(strike))
        half = max(self.x_span * sig0 * np.sqrt(max(T, 0.05)), 0.5)
        x = np.linspace(center - half, center + half, self.n_x)
        if self.sigma is not None:
            sig2 = np.full((self.n_t, self.n_x), sig0 ** 2, np.float32)
        else:
            # Dupire rows resampled at step midpoints (step_tables), then
            # interpolated onto this grid's y = x - log F_t coordinate.
            # Backward ordering: scan step k covers calendar time
            # t = T - (k + 1/2) * dt.
            rows, t_mid = self.localvol.step_tables(T, self.n_t)
            lv = self.localvol
            sig2 = np.empty((self.n_t, self.n_x), np.float32)
            for k in range(self.n_t):
                t = float(T - t_mid[k])                 # backward index
                ti = int(np.clip(np.searchsorted(t_mid, t), 0,
                                 self.n_t - 1))
                y = x - (np.log(spot) + (self.r - self.q) * max(t, 1e-4))
                sig2[k] = np.interp(y, lv.y_grid, rows[ti],
                                    left=rows[ti][0], right=rows[ti][-1])
        return (jnp.asarray(x, jnp.float32), jnp.asarray(sig2))

    def price(self, spot: float, strike: float, T: float,
              is_call: bool = True, american: bool = False,
              dividends=None) -> Dict[str, float]:
        """`dividends`: optional [(t_ex, fraction), ...] discrete
        PROPORTIONAL dividends (S drops to S(1-frac) at t_ex); under
        flat vol the European price equals BS at S0·Π(1-frac_i) — the
        classic exact adjustment, used as the test oracle. American
        calls regain early-exercise value just before ex-dates."""
        x, sig2 = self._grids(spot, strike, T)
        div_shift = np.zeros(self.n_t, np.float32)
        if dividends:
            dt = T / self.n_t
            for t_ex, frac in dividends:
                if not 0.0 < t_ex < T:
                    continue
                if not 0.0 <= frac < 1.0:
                    raise ValueError("dividend fraction must be in [0, 1)")
                # backward step k covers calendar (T-(k+1)dt, T-k·dt].
                k = min(int((T - t_ex) / dt), self.n_t - 1)
                div_shift[k] += np.log1p(-frac)
        v, _ = _cn_solve(sig2, jnp.float32(strike), jnp.float32(T),
                         jnp.float32(self.r), jnp.float32(self.q), x,
                         jnp.asarray(div_shift),
                         n_x=self.n_x, n_t=self.n_t, is_call=is_call,
                         american=american)
        v = np.asarray(v, np.float64)
        xg = np.asarray(x, np.float64)
        x0 = np.log(spot)
        price = float(np.interp(x0, xg, v))
        # Spatial Greeks from the grid: dV/dS = (dV/dx)/S etc.
        dvdx = np.gradient(v, xg)
        d2vdx2 = np.gradient(dvdx, xg)
        delta = float(np.interp(x0, xg, dvdx)) / spot
        gamma = (float(np.interp(x0, xg, d2vdx2))
                 - float(np.interp(x0, xg, dvdx))) / spot**2
        return {
            "price": price,
            "delta": delta,
            "gamma": gamma,
            "n_x": self.n_x,
            "n_t": self.n_t,
            "method": "crank-nicolson" + ("-projected" if american else ""),
        }

    def exercise_boundary(self, spot: float, strike: float, T: float,
                          is_call: bool = False,
                          dividends=None) -> Dict:
        """Early-exercise boundary S*(t) of the American contract.

        Extracted inside the same Crank–Nicolson scan that prices the
        option: at each backward step the projection's binding edge (where
        continuation < intrinsic meets intrinsic > 0) is the boundary node
        — no extra solve, no regression noise (the LSM boundary is a noisy
        by-product; the PDE one is the textbook object). Returned in
        calendar time, ascending; NaN where exercise is never optimal at
        that date (e.g. anywhere on a q=0 American call). The boundary
        converges to the strike (puts, q≤r) as t→T.

        Capability absent from the reference (no American support at all).
        """
        x, sig2 = self._grids(spot, strike, T)
        div_shift = np.zeros(self.n_t, np.float32)
        if dividends:
            dt_ = T / self.n_t
            for t_ex, frac in dividends:
                if 0.0 < t_ex < T:
                    k = min(int((T - t_ex) / dt_), self.n_t - 1)
                    div_shift[k] += np.log1p(-frac)
        v, s_stars = _cn_solve(
            sig2, jnp.float32(strike), jnp.float32(T), jnp.float32(self.r),
            jnp.float32(self.q), x, jnp.asarray(div_shift),
            n_x=self.n_x, n_t=self.n_t, is_call=is_call, american=True)
        s_stars = np.asarray(s_stars, np.float64)
        s_stars[~np.isfinite(s_stars)] = np.nan
        # Backward step k sits at time-to-maturity (k+1)·dt ⇒ calendar
        # t = T − (k+1)·dt; reverse into ascending calendar order.
        dt = T / self.n_t
        t_cal = T - (np.arange(self.n_t) + 1.0) * dt
        order = np.argsort(t_cal)
        price = float(np.interp(np.log(spot), np.asarray(x, np.float64),
                                np.asarray(v, np.float64)))
        return {
            "t": t_cal[order].tolist(),
            "s_star": s_stars[order].tolist(),
            "price": price,
            "strike": float(strike),
            "is_call": bool(is_call),
        }
