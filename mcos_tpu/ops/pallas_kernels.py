"""Fused Pallas TPU kernels for path simulation.

TPU-native equivalent of the reference's single compiled component — the
Numba JIT kernel `_simulate_svj_paths_numba` (engine/monte_carlo.py:189-243).
This is the performance path; `mcos_tpu.ops.simulate` holds the semantically
identical (and differentiable) `lax.scan` implementation, and the test suite
pins the two against each other.

Design:

- **RNG inside the kernel.** Uniform bits come from the TPU's hardware PRNG
  (`pltpu.prng_random_bits`), converted to normals with Box-Muller — no
  (paths × steps) random tensors ever touch HBM, unlike the reference's
  pre-drawn Z arrays (monte_carlo.py:290-308). HBM traffic per path is 4-12
  output bytes total, so the kernel is compute-bound by design.
- **Log-space spot, relative to S0.** The carry holds log(S/S0); there is no
  per-step `exp` (the reference exponentiates every step, monte_carlo.py:236)
  and the O(0.1) accumulator resolves tiny drift increments ~150× finer than
  an absolute log S ≈ 10 would in f32 (see ops/simulate.py). One `exp` at
  the end materializes S_T.
- **Antithetic via paired grid blocks.** Grid blocks b and b + G/2 reseed the
  PRNG with the same per-pair seed and apply opposite signs to the normals,
  sharing jump-occurrence uniforms — the reference's antithetic convention
  (monte_carlo.py:318-324) with zero extra register pressure per block.
- **Full truncation** variance scheme, compensated drift, Bernoulli-approx
  Poisson jumps — exactly the recursion at monte_carlo.py:221-239.
- **GBM companion leg** for the control variate rides the same dW₁
  (see mcos_tpu/engine/pricer.py for why the reference's CV is biased).

Layout: paths live as (ROWS, 128) fp32 tiles — lane dim 128, sublane multiple
of 8 — so every op maps 1:1 onto VPU vregs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcos_tpu.models.params import SVJParams

Array = jax.Array

LANES = 128
DEFAULT_ROWS = 256          # paths per block = ROWS * LANES = 32768
# Kernels with more per-path carry state default to SMALLER row counts —
# the v5e rows sweep (2^21-2^22 paths x 1024 steps, sustained) shows the
# optimum tracks vreg pressure: gbm 256, svj/svcj/td 64, qe 128,
# hhw/path-stats 32, rbergomi lift 16 (24 factor carries). Measured wins
# vs rows=256: svj +8.5%, hhw +38%, stats +8.8%, svcj +4.7%, td +5.8%.
_TWO_PI = 6.283185307179586


def _interpret():
    """Off-TPU, run kernels through the Pallas TPU interpreter.

    NOTE: the interpreter does NOT emulate the hardware PRNG —
    `prng_random_bits` yields zeros there, so interpreted runs are only good
    for shape/compile smoke tests. The pricing engine auto-selects the scan
    backend off-TPU (engine/pricer.py), so this path is never hit in
    production; statistical validation of the kernels runs on real TPU
    (bench.py + the verify drive + TPU-gated tests).
    """
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()

# Packed scalar-parameter layout (single SMEM vector, see _pack_params).
_P_SPOT, _P_V0, _P_DT, _P_SQRT_DT, _P_KAPPA, _P_THETA, _P_XI, _P_RHO, \
    _P_RHO_PERP, _P_LAM_DT, _P_MU_J, _P_SIG_J, _P_DRIFT_DT, _P_G_DRIFT_DT, \
    _P_SIG_CV, _P_BRIDGE_B, _P_BRIDGE_L, _P_NPARAMS = range(18)

# Jump-count CDF table appended after the scalars (see _binom_count_cdf):
# slot _P_NPARAMS + k holds P(Binom(num_steps, λ·dt) ≤ k), k = 0..K−1.
_P_CDF_K = 64


def _binom_count_cdf(lam_dt, num_steps: int, kmax: int = _P_CDF_K) -> Array:
    """CDF of the total jump count, Binomial(num_steps, λ·dt), k = 0..kmax−1.

    The terminal-law kernels never need jump *timing* — conditional on the
    count n, the summed Merton size is N(n·μ_J, n·σ_J²) (the compound
    identity, see _svj_kernel) — so the per-step Bernoulli accumulation
    Σ 1{U_t < λ·dt} can be replaced by ONE inverse-CDF draw of the exact
    Binomial total: count = Σ_k 1{u > cdf_k}. Law-identical to the per-step
    scheme (jumps are independent of the diffusion draws in both).

    Truncation at kmax=64 only matters when P(count > 63) exceeds the
    23-bit uniform grid the kernels sample on (2⁻²³ ≈ 1.2e-7) — i.e.
    λT ≳ 30, far outside PARAM_BOUNDS' λ ≤ 10 at desk maturities; the old
    per-step compare carried the same per-step quantization. Trace-side
    f32 recurrence: pmf_{k+1} = pmf_k · ratio · (n−k)/(k+1); errors are
    ~64 ulps ≈ 1e-6 absolute on the thresholds, far below MC noise.
    """
    p = jnp.clip(jnp.asarray(lam_dt, jnp.float32), 0.0, 1.0 - 1e-7)
    n = jnp.float32(num_steps)
    ratio = p / (1.0 - p)
    # (1−p)^n by binary exponentiation (num_steps is static), all
    # multiplicative — no device transcendentals: TPU exp/log1p are
    # ~1e-5-class on this amplified path (n multiplies the log's error;
    # measured 3.9e-5 absolute on the CDF before this was caught by the
    # TPU run of test_binom_count_cdf_matches_scipy_and_inverts).
    pmf0 = jnp.float32(1.0)
    base, e = 1.0 - p, int(num_steps)
    while e:
        if e & 1:
            pmf0 = pmf0 * base
        base, e = base * base, e >> 1

    def step(pmf, k):
        return pmf * ratio * (n - k) / (k + 1.0), pmf

    _, pmfs = jax.lax.scan(step, pmf0,
                           jnp.arange(kmax, dtype=jnp.float32))
    cdf = jnp.cumsum(pmfs)
    # Normalize by the last entry: pmf0's own f32 error (forming 1−p
    # loses ~1.3e-8 which ^n amplifies to ~2e-5) is a COMMON factor of
    # every pmf_k, so the ratio cancels it exactly; what remains is the
    # ~ulp-scale recurrence rounding (measured <5e-7). Semantically this
    # conditions on count < kmax — the table's truncation contract
    # (P(count ≥ 64) < 2⁻²³ on the valid λT domain) unchanged.
    return jnp.minimum(cdf / cdf[-1], 1.0)


def _poisson_binom_cdf(p_steps: Array, kmax: int = _P_CDF_K) -> Array:
    """CDF of Σᵢ Bernoulli(pᵢ) for per-step probabilities pᵢ = λᵢ·dt —
    the time-dependent analogue of `_binom_count_cdf` (td-SVJ kernel).

    Trace-side DP over steps on a kmax-state pmf vector:
    pmf′ₖ = pmfₖ·(1−pᵢ) + pmfₖ₋₁·pᵢ. Mass beyond kmax−1 drops out of the
    vector, so the cumsum saturates below 1 and the inverse transport
    clamps the count at kmax — the same (negligible) truncation contract
    as the constant-λ table.
    """
    p_steps = jnp.clip(jnp.asarray(p_steps, jnp.float32), 0.0, 1.0 - 1e-7)
    init = jnp.zeros(kmax, jnp.float32).at[0].set(1.0)

    def step(pmf, p):
        shifted = jnp.concatenate([jnp.zeros(1, jnp.float32), pmf[:-1]])
        return pmf * (1.0 - p) + shifted * p, None

    pmf, _ = jax.lax.scan(step, init, p_steps)
    cdf = jnp.cumsum(pmf)
    # Same normalization as _binom_count_cdf: the Π(1−pᵢ) rounding error
    # is (nearly) common across entries and cancels in the ratio.
    return jnp.minimum(cdf / cdf[-1], 1.0)


def _count_from_u(u: Array, p_ref, base: int, kmax: int = _P_CDF_K) -> Array:
    """Jump count from one uniform via the packed CDF table (monotone
    inverse-CDF transport; runs ONCE per path, ~2·kmax cheap VPU ops)."""
    cnt = jnp.zeros_like(u)
    for k in range(kmax):
        cnt = cnt + jnp.where(u > p_ref[base + k], 1.0, 0.0)
    return cnt


def _pack_params(params: SVJParams, spot, T, num_steps: int,
                 bridge_log_b=0.0, bridge_log_l=0.0) -> Array:
    """Precompute per-step scalar constants on the trace side (f32 vector)."""
    f = lambda x: jnp.asarray(x, jnp.float32)
    dt = f(T) / num_steps
    k = jnp.exp(f(params.mu_j) + 0.5 * f(params.sigma_j) ** 2) - 1.0
    sigma_cv = jnp.sqrt(f(params.v0))
    vec = jnp.zeros((_P_NPARAMS,), jnp.float32)
    vals = {
        _P_SPOT: f(spot),
        _P_V0: f(params.v0),
        _P_DT: dt,
        _P_SQRT_DT: jnp.sqrt(dt),
        _P_KAPPA: f(params.kappa),
        _P_THETA: f(params.theta),
        _P_XI: f(params.xi),
        _P_RHO: f(params.rho),
        _P_RHO_PERP: jnp.sqrt(1.0 - f(params.rho) ** 2),
        _P_LAM_DT: f(params.lambda_j) * dt,
        _P_MU_J: f(params.mu_j),
        _P_SIG_J: f(params.sigma_j),
        _P_DRIFT_DT: (f(params.r) - f(params.q) - f(params.lambda_j) * k) * dt,
        _P_G_DRIFT_DT: (f(params.r) - f(params.q) - 0.5 * sigma_cv**2) * dt,
        _P_SIG_CV: sigma_cv,
        _P_BRIDGE_B: f(bridge_log_b),
        _P_BRIDGE_L: f(bridge_log_l),
    }
    for i, v in vals.items():
        vec = vec.at[i].set(v)
    # Binomial jump-count CDF table (terminal-law kernels draw the total
    # count once per path — see _binom_count_cdf).
    cdf = _binom_count_cdf(vals[_P_LAM_DT], num_steps)
    return jnp.concatenate([vec, cdf])


def _bits_to_uniform(bits: Array) -> Array:
    """random bits → f32 uniform strictly inside (0, 1).

    Uses the top 23 bits plus a half-ulp offset: u = (bits>>9 + 0.5)·2⁻²³,
    so log(u) and Box-Muller are safe (max |z| ≈ 5.8σ at f32 resolution).
    The bitcast forces an unsigned interpretation — prng_random_bits may
    surface int32, and an arithmetic shift of a negative word would produce
    u < 0 (NaN through log).
    """
    ubits = pltpu.bitcast(bits, jnp.uint32)
    top = jax.lax.shift_right_logical(ubits, jnp.uint32(9))
    # Mosaic lacks a uint32→f32 cast; after the shift the word is < 2²³ so a
    # signed reinterpretation is lossless and int32→f32 lowers natively.
    top_i32 = pltpu.bitcast(top, jnp.int32)
    return (top_i32.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -23)


def _sincos_2pi(u: Array) -> Tuple[Array, Array]:
    """(sin 2πu, cos 2πu) for u ∈ [0, 1) — quadrant-folded minimax
    polynomials instead of libm trig.

    Mosaic's generic sin/cos pay full argument range reduction; measured
    on v5e the PAIR costs 27.5 ps/element and dominates every simulation
    kernel's roofline (benchmarks/roofline.py). Box-Muller's angle is
    2πu with u already in [0, 1), so the reduction is one round-to-
    nearest quarter-turn: a = 4u, q = round(a), φ = (a−q)·π/2 ∈
    [−π/4, π/4], then the Cephes f32 minimax polys for sin/cos on that
    interval and a branchless quadrant rotation (both outputs reuse the
    SAME two poly evals). ~16 cheap VPU ops ≈ 8 ps/pair (3.4× cheaper);
    max abs error vs f64 libm: 9.8e-8 over a 4M-point sweep of [0,1)
    (ulp-level — tests/test_pallas.py pins the moments either way).
    """
    a = 4.0 * u
    q = jnp.round(a)
    phi = (a - q) * jnp.float32(1.5707963267948966)   # π/2
    x2 = phi * phi
    s = phi * (1.0 + x2 * (jnp.float32(-1.6666654611e-1)
               + x2 * (jnp.float32(8.3321608736e-3)
                       + x2 * jnp.float32(-1.9515295891e-4))))
    c = 1.0 + x2 * (jnp.float32(-0.5)
                    + x2 * (jnp.float32(4.166664568298827e-2)
                            + x2 * (jnp.float32(-1.388731625493765e-3)
                                    + x2 * jnp.float32(2.443315711809948e-5))))
    qm = q - 4.0 * jnp.floor(q * 0.25)      # quadrant mod 4 (float)
    odd = (qm == 1.0) | (qm == 3.0)
    sin_out = jnp.where(odd, c, s)
    cos_out = jnp.where(odd, s, c)
    sin_out = jnp.where((qm == 2.0) | (qm == 3.0), -sin_out, sin_out)
    cos_out = jnp.where((qm == 1.0) | (qm == 2.0), -cos_out, cos_out)
    return sin_out, cos_out


def _boxmuller(u1: Array, u2: Array) -> Tuple[Array, Array]:
    """Two independent standard normals from two uniforms."""
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    s, c = _sincos_2pi(u2)
    return r * c, r * s


# Acklam's rational approximation of the inverse normal CDF (relative error
# < 1.2e-9 — far below f32 resolution). Horner-form polynomials over a
# branchless central/tail select, so the whole transform is VPU-friendly:
# 1 log + 1 sqrt + 2 rational evals per draw.
_ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02,
          -2.759285104469687e+02, 1.383577518672690e+02,
          -3.066479806614716e+01, 2.506628277459239e+00)
_ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02,
          -1.556989798598866e+02, 6.680131188771972e+01,
          -1.328068155288572e+01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01,
          -2.400758277161838e+00, -2.549732539343734e+00,
          4.374664141464968e+00, 2.938163982698783e+00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
_ACK_PLOW = 0.02425


def _horner(x: Array, coeffs) -> Array:
    acc = jnp.float32(coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + jnp.float32(c)
    return acc


def _ndtri_kernel(u: Array) -> Array:
    """Inverse normal CDF for u strictly inside (0, 1) (see _ACK_* above)."""
    # Central region |u - 0.5| ≤ 0.5 - plow.
    qc = u - 0.5
    r = qc * qc
    x_central = _horner(r, _ACK_A) * qc / (_horner(r, _ACK_B) * r + 1.0)
    # Tails, symmetric via pm = min(u, 1-u); magnitude is the lower-tail value.
    pm = jnp.minimum(u, 1.0 - u)
    qt = jnp.sqrt(-2.0 * jnp.log(pm))
    x_tail = _horner(qt, _ACK_C) / (_horner(qt, _ACK_D) * qt + 1.0)
    x_tail = jnp.where(qc < 0.0, x_tail, -x_tail)
    central = jnp.abs(qc) <= jnp.float32(0.5 - _ACK_PLOW)
    return jnp.where(central, x_central, x_tail)


# ─────────────────────────────────────────────────────────────────────────────
# SVJ kernel
# ─────────────────────────────────────────────────────────────────────────────
def _svj_kernel(seed_ref, p_ref, *out_refs,
                num_steps: int, rows: int, companion: bool, n_branch: int):
    """One path block of the fused SVJ simulator (see module docstring).

    The loop advances TWO steps per iteration with fully-utilized Box-Muller
    pairs: 2 BM transforms + 4 random draws per 2 steps. Jumps use the
    compound identity: Merton jumps never feed back into the diffusion
    (they are additive in log S and independent of v), so conditional on
    the per-path occurrence count n, the summed size is N(n·mu_j,
    n·sig_j²). Round 5 pushes the identity to its end: the per-step
    Bernoulli accumulation itself is gone — the total count over
    num_steps i.i.d. Bernoulli(λ·dt) trials is exactly
    Binomial(num_steps, λ·dt), so ONE end-of-path uniform inverts the
    host-packed Binomial CDF (_binom_count_cdf) and ONE normal
    materializes the summed size. Law-identical to the per-step scheme,
    and it deletes one carry register plus 2 of 6 per-body draw
    subblocks (the PRNG draw is the single most expensive op class in
    the roofline audit). The per-step-jump recursion lives on in the
    differentiable scan twin (ops/simulate.py) and the path-stats
    kernel, where jump *timing* matters. Removing the third per-pair BM
    transform measured +37% sustained on v5e (15.8 → 21.6 G
    path-steps/s at 2^22 × 1024); the Binomial-count rewrite + the
    redundant-clamp/coefficient-form cleanups below measured
    81.5 → 90.6 G (rows=64 still optimal after the carry deletion —
    swept 32/64/128). Odd step counts run one single-step tail
    (statically unrolled).

    Like QE, the antithetic pair is fused into ONE grid block: the
    branches flip both normals, so the variance paths differ (both v
    carries stay), but the draws, the Box-Muller transforms, the shared
    dW₂ mix, the jump count, and the end-of-path jump normal are all
    computed ONCE per pair. The companion-CV leg collapses to a single
    accumulator: log G_± = g_drift·t ± σ_cv·W₁, odd in W₁ by
    construction, so one Σσ_cv dW₁ carry serves both branches. Measured
    v5e sustained 21.6 → 37.3 G path-steps/s at 2^22 × 1024; the
    `_sincos_2pi` poly Box-Muller lifts it further to 75.4G.
    """
    nb = n_branch
    s_ref = out_refs[0:nb]
    v_ref = out_refs[nb:2 * nb]
    g_ref = out_refs[2 * nb:3 * nb]
    signs = (1.0, -1.0)[:nb]
    # One block per antithetic pair; branch signs live in-block. Seeded by
    # block id so engines with adjacent seeds don't alias block streams.
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    shape = (rows, LANES)
    spot = p_ref[_P_SPOT]
    dt = p_ref[_P_DT]
    sqrt_dt = p_ref[_P_SQRT_DT]
    kappa, theta, xi = p_ref[_P_KAPPA], p_ref[_P_THETA], p_ref[_P_XI]
    rho, rho_perp = p_ref[_P_RHO], p_ref[_P_RHO_PERP]
    mu_j, sig_j = p_ref[_P_MU_J], p_ref[_P_SIG_J]
    drift_dt = p_ref[_P_DRIFT_DT]
    g_drift_dt = p_ref[_P_G_DRIFT_DT]
    sig_cv = p_ref[_P_SIG_CV]
    # Loop-invariant scalar forms (hoisted by the compiler): spot drift as
    # drift_dt + nhdt·v; variance drift as omk·v + ktheta_dt — same
    # algebra as the scan twin's κ(θ−v)dt, one FMA cheaper per branch.
    nhdt = jnp.float32(-0.5) * dt
    omk = 1.0 - kappa * dt
    ktheta_dt = kappa * theta * dt

    def one_step(log_s, v, cv_w, z1, z2):
        # log_s, v: per-branch tuples; z1/z2 are the base-branch normals.
        dw1 = z1 * sqrt_dt
        dw2 = rho * dw1 + rho_perp * z2 * sqrt_dt  # flips with the pair sign
        new_s, new_v = [], []
        for k in range(nb):
            # v carry is clamped ≥ 0 below and v0 ≥ 0, so no max() here.
            v_k = v[k]
            sqrt_v = jnp.sqrt(v_k)
            new_s.append(log_s[k] + (drift_dt + nhdt * v_k)
                         + sqrt_v * (signs[k] * dw1))
            new_v.append(jnp.maximum(
                omk * v_k + ktheta_dt + xi * (sqrt_v * (signs[k] * dw2)),
                0.0))
        if companion:
            cv_w = cv_w + sig_cv * dw1
        return tuple(new_s), tuple(new_v), cv_w

    def body(_, carry):
        log_s, v, cv_w = carry
        bits = pltpu.prng_random_bits((4, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(4)]
        z_a, z_b = _boxmuller(u[0], u[1])
        z_c, z_d = _boxmuller(u[2], u[3])
        log_s, v, cv_w = one_step(log_s, v, cv_w, z_a, z_b)
        log_s, v, cv_w = one_step(log_s, v, cv_w, z_c, z_d)
        return log_s, v, cv_w

    # log(S/S0) carry (see ops/simulate.py on f32 drift quantization).
    zeros = jnp.zeros(shape, jnp.float32)
    init = ((zeros,) * nb,
            (jnp.full(shape, p_ref[_P_V0], jnp.float32),) * nb,
            zeros)
    log_s, v, cv_w = jax.lax.fori_loop(0, num_steps // 2, body, init)

    if num_steps % 2 == 1:  # static tail step
        bits = pltpu.prng_random_bits((2, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(2)]
        z1, z2 = _boxmuller(u[0], u[1])
        log_s, v, cv_w = one_step(log_s, v, cv_w, z1, z2)

    # Compound jump total: ONE uniform inverts the Binomial count CDF and
    # ONE normal materializes the summed sizes; the antithetic pair
    # negates the size normal (reference semantics: -Z_jump_size on the
    # second branch, monte_carlo.py:318-324) and shares the count (the
    # per-step scheme shared its jump uniforms the same way).
    bits = pltpu.prng_random_bits((3, rows, LANES))
    n_jump = _count_from_u(_bits_to_uniform(bits[0]), p_ref, _P_NPARAMS)
    z_total, _ = _boxmuller(_bits_to_uniform(bits[1]),
                            _bits_to_uniform(bits[2]))
    jump_mean = mu_j * n_jump
    jump_body = sig_j * jnp.sqrt(n_jump) * z_total

    g_drift_total = g_drift_dt * jnp.float32(num_steps)
    for k in range(nb):
        s_ref[k][:] = spot * jnp.exp(log_s[k] + jump_mean
                                     + signs[k] * jump_body)
        v_ref[k][:] = v[k]
        if companion:
            g_ref[k][:] = spot * jnp.exp(g_drift_total + signs[k] * cv_w)
        else:
            g_ref[k][:] = jnp.zeros(shape, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_steps", "antithetic", "companion",
                     "rows"),
)
def svj_terminal_pallas(
    params: SVJParams,
    spot,
    T,
    seed,
    *,
    num_paths: int,
    num_steps: int,
    antithetic: bool = True,
    companion: bool = False,
    rows: int = 64,
) -> Tuple[Array, Array, Optional[Array]]:
    """Fused-TPU-kernel drop-in for `simulate.simulate_terminal`.

    Returns (S_final, v_final, G_final or None), each (n_branch, num_paths)
    with row 0 = base branch, row 1 = antithetic branch. `num_paths` refers to
    paths *per branch* and is rounded up to a multiple of rows·128 internally;
    outputs are sliced back to `num_paths`.
    """
    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    padded = half_grid * block_paths

    kernel = functools.partial(
        _svj_kernel, num_steps=num_steps, rows=rows,
        companion=companion, n_branch=n_branch,
    )
    out_shape = jax.ShapeDtypeStruct((half_grid * rows, LANES), jnp.float32)
    block_spec = pl.BlockSpec((rows, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)

    seed_arr = jnp.asarray([seed], jnp.int32)
    p_vec = _pack_params(params, spot, T, num_steps)

    outs = pl.pallas_call(
        kernel,
        grid=(half_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # packed params
        ],
        out_specs=(block_spec,) * (3 * n_branch),
        out_shape=(out_shape,) * (3 * n_branch),
        interpret=_interpret(),
    )(seed_arr, p_vec)

    def take(arrs):
        return jnp.stack([a.reshape(padded)[:num_paths] for a in arrs])

    s = take(outs[0:n_branch])
    v = take(outs[n_branch:2 * n_branch])
    g = take(outs[2 * n_branch:3 * n_branch]) if companion else None
    return s, v, g


# ─────────────────────────────────────────────────────────────────────────────
# SVJ draws-driven kernel (QMC / CRN hot path)
# ─────────────────────────────────────────────────────────────────────────────
def _svj_draws_kernel(*refs,
                      chunk: int, num_steps: int, rows: int, n_branch: int,
                      companion: bool, rng_jumps: bool):
    """SVJ recursion fed by *pre-drawn* randoms streaming from HBM.

    This is the fused twin of `simulate.simulate_terminal_from_draws` — the
    Sobol+Brownian-bridge driver's execution engine. Unlike the PRNG kernels
    above, the randoms already live in HBM (they carry QMC structure), so the
    kernel is bandwidth-bound by construction: each draw word is read exactly
    once, both antithetic branches ride the same streamed block (sign flip on
    the normals, shared jump uniforms — the convention of
    monte_carlo.py:318-324), and nothing else touches HBM until the final
    terminal-state write.

    Grid: (path blocks ∥, step chunks →). The (log S, v, log G) carry
    persists across step chunks in VMEM scratch; outputs are written once on
    the last chunk. Steps are padded up to a chunk multiple and masked by
    global step index.

    rng_jumps=True drops the u_jump input entirely: jump-occurrence uniforms
    carry no QMC structure (the reference draws them from a plain PRNG too),
    so they come from the hardware PRNG — one less (paths × steps) array
    generated, stored, and streamed. The stream is seeded per (path block,
    chunk) so it is identical for both antithetic branches and independent
    across grid cells.
    """
    if rng_jumps:
        (seed_ref, p_ref, z1_ref, z2_ref, zjs_ref,
         s_ref, v_ref, g_ref, ls_s, v_s, lg_s) = refs
        uj_ref = None
        # One stream per (path block, chunk) grid cell, identical for both
        # antithetic branches (they share this block). Mosaic accepts at
        # most 2 seed words, so the cell index is flattened.
        cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], cell)
    else:
        (p_ref, z1_ref, z2_ref, uj_ref, zjs_ref,
         s_ref, v_ref, g_ref, ls_s, v_s, lg_s) = refs
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    shape = (n_branch, rows, LANES)

    @pl.when(c == 0)
    def _init():
        # log(S/S0) carry (see ops/simulate.py on f32 drift quantization).
        ls_s[:] = jnp.zeros(shape, jnp.float32)
        v_s[:] = jnp.full(shape, p_ref[_P_V0], jnp.float32)
        lg_s[:] = jnp.zeros(shape, jnp.float32)

    dt = p_ref[_P_DT]
    sqrt_dt = p_ref[_P_SQRT_DT]
    kappa, theta, xi = p_ref[_P_KAPPA], p_ref[_P_THETA], p_ref[_P_XI]
    rho, rho_perp = p_ref[_P_RHO], p_ref[_P_RHO_PERP]
    lam_dt = p_ref[_P_LAM_DT]
    mu_j, sig_j = p_ref[_P_MU_J], p_ref[_P_SIG_J]
    drift_dt = p_ref[_P_DRIFT_DT]
    g_drift_dt = p_ref[_P_G_DRIFT_DT]
    sig_cv = p_ref[_P_SIG_CV]

    # sign[0] = +1 (base branch), sign[1] = −1 (antithetic branch).
    # (int32 iota: Mosaic rejects float iota results.)
    sign = (1 - 2 * jax.lax.broadcasted_iota(
        jnp.int32, (n_branch, 1, 1), 0)).astype(jnp.float32)

    def body(i, carry):
        log_s, v, log_g = carry
        z1 = z1_ref[i] * sign       # (rows, L) ⊗ sign → (n_branch, rows, L)
        z2 = z2_ref[i] * sign
        z_js = zjs_ref[i] * sign
        if rng_jumps:               # shared across the antithetic pair
            u_jump = _bits_to_uniform(pltpu.prng_random_bits((rows, LANES)))
        else:
            u_jump = uj_ref[i]

        v_pos = jnp.maximum(v, 0.0)
        sqrt_v = jnp.sqrt(v_pos)
        dw1 = z1 * sqrt_dt
        dw2 = rho * dw1 + rho_perp * z2 * sqrt_dt
        jump = jnp.where(u_jump < lam_dt, mu_j + sig_j * z_js, 0.0)
        new_log_s = log_s + (drift_dt - 0.5 * v_pos * dt) + sqrt_v * dw1 + jump
        new_v = jnp.maximum(v_pos + kappa * (theta - v_pos) * dt
                            + xi * sqrt_v * dw2, 0.0)
        valid = (c * chunk + i) < num_steps  # step-padding mask
        log_s = jnp.where(valid, new_log_s, log_s)
        v = jnp.where(valid, new_v, v)
        if companion:
            log_g = jnp.where(valid, log_g + g_drift_dt + sig_cv * dw1, log_g)
        return log_s, v, log_g

    carry = (ls_s[:], v_s[:], lg_s[:])
    log_s, v, log_g = jax.lax.fori_loop(0, chunk, body, carry)
    ls_s[:] = log_s
    v_s[:] = v
    lg_s[:] = log_g

    @pl.when(c == n_chunks - 1)
    def _finish():
        spot = p_ref[_P_SPOT]
        s_ref[:] = spot * jnp.exp(log_s)
        v_ref[:] = v
        if companion:
            g_ref[:] = spot * jnp.exp(log_g)
        else:
            g_ref[:] = jnp.zeros(shape, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("antithetic", "companion", "rows", "chunk",
                     "steps_major"),
)
def svj_terminal_from_draws_pallas(
    params: SVJParams,
    spot,
    T,
    z1: Array,
    z2: Array,
    u_jump: Optional[Array],
    z_js: Array,
    *,
    seed=0,
    antithetic: bool = True,
    companion: bool = False,
    rows: int = 16,
    chunk: int = 32,
    steps_major: bool = False,
) -> Tuple[Array, Array, Optional[Array]]:
    """Fused-kernel drop-in for `simulate.simulate_terminal_from_draws`.

    Args:
        z1, z2, z_js, u_jump: (num_paths, num_steps) draw arrays (the
            reference layout) or (num_steps, num_paths) with
            `steps_major=True` — the layout `sobol_svj_draws` produces,
            which streams into the kernel with zero transposes.
    Returns:
        (S, v, G or None), each (n_branch, num_paths): row 0 is the base
        branch, row 1 (when antithetic) negates the normals and shares the
        jump uniforms. Unlike the PRNG kernels this one consumes external
        randoms, so it is deterministic given the draws and CPU-testable in
        the Pallas interpreter (tests pin it bit-close to the scan twin).
    """
    if steps_major:
        num_steps, num_paths = z1.shape
    else:
        num_paths, num_steps = z1.shape
    n_chunks = max(1, -(-num_steps // chunk))
    steps_pad = n_chunks * chunk
    block_paths = rows * LANES
    n_blocks = max(1, -(-num_paths // block_paths))
    r_tot = n_blocks * rows
    padded_paths = n_blocks * block_paths
    n_branch = 2 if antithetic else 1

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if not steps_major:
            x = x.T  # (steps, paths)
        x = jnp.pad(x, ((0, steps_pad - num_steps),
                        (0, padded_paths - num_paths)))
        return x.reshape(steps_pad, r_tot, LANES)

    rng_jumps = u_jump is None
    kernel = functools.partial(
        _svj_draws_kernel, chunk=chunk, num_steps=num_steps, rows=rows,
        n_branch=n_branch, companion=companion, rng_jumps=rng_jumps)
    in_spec = pl.BlockSpec((chunk, rows, LANES), lambda b, c: (c, b, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_branch, rows, LANES), lambda b, c: (0, b, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_branch, r_tot, LANES), jnp.float32)
    scratch = pltpu.VMEM((n_branch, rows, LANES), jnp.float32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    if rng_jumps:
        inputs = (jnp.asarray([seed], jnp.int32),
                  _pack_params(params, spot, T, num_steps),
                  prep(z1), prep(z2), prep(z_js))
        in_specs = [smem, smem, in_spec, in_spec, in_spec]
    else:
        inputs = (_pack_params(params, spot, T, num_steps),
                  prep(z1), prep(z2), prep(u_jump), prep(z_js))
        in_specs = [smem, in_spec, in_spec, in_spec, in_spec]

    s, v, g = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[scratch, scratch, scratch],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(*inputs)

    def split(x):
        return x.reshape(n_branch, padded_paths)[:, :num_paths]

    return split(s), split(v), (split(g) if companion else None)


# ─────────────────────────────────────────────────────────────────────────────
# SVJ QE kernel (Andersen quadratic-exponential scheme)
# ─────────────────────────────────────────────────────────────────────────────
# Packed QE scalar layout (distinct from the Euler layout above: QE's
# per-step constants are transition moments, not SDE coefficients).
(_Q_SPOT, _Q_V0, _Q_THETA, _Q_EKDT, _Q_VAR1, _Q_VAR2, _Q_K0, _Q_K1, _Q_K2,
 _Q_K34, _Q_DRIFT_DT, _Q_LAM_DT, _Q_MU_J, _Q_SIG_J, _Q_G_DRIFT_DT, _Q_SIG_CV,
 _Q_SQRT_DT, _Q_NPARAMS) = range(18)

_QE_PSI_C = 1.5


def _pack_qe_params(params: SVJParams, spot, T, num_steps: int) -> Array:
    """Precompute the QE transition constants (ops/simulate.py:276-301)."""
    f = lambda x: jnp.asarray(x, jnp.float32)
    p = params
    dt = f(T) / num_steps
    kappa, theta, xi, rho = f(p.kappa), f(p.theta), f(p.xi), f(p.rho)
    e_kdt = jnp.exp(-kappa * dt)
    c_mean = 1.0 - e_kdt
    gamma = 0.5
    k_over = kappa * rho / jnp.maximum(xi, 1e-12) - 0.5
    k_comp = jnp.exp(f(p.mu_j) + 0.5 * f(p.sigma_j) ** 2) - 1.0
    sigma_cv = jnp.sqrt(f(p.v0))
    vec = jnp.zeros((_Q_NPARAMS,), jnp.float32)
    vals = {
        _Q_SPOT: f(spot),
        _Q_V0: f(p.v0),
        _Q_THETA: theta,
        _Q_EKDT: e_kdt,
        _Q_VAR1: xi**2 * e_kdt * c_mean / jnp.maximum(kappa, 1e-12),
        _Q_VAR2: theta * xi**2 * c_mean**2 / jnp.maximum(2.0 * kappa, 1e-12),
        _Q_K0: -rho * kappa * theta * dt / jnp.maximum(xi, 1e-12),
        _Q_K1: gamma * dt * k_over - rho / jnp.maximum(xi, 1e-12),
        _Q_K2: gamma * dt * k_over + rho / jnp.maximum(xi, 1e-12),
        _Q_K34: gamma * dt * (1.0 - rho**2),
        _Q_DRIFT_DT: (f(p.r) - f(p.q) - f(p.lambda_j) * k_comp) * dt,
        _Q_LAM_DT: f(p.lambda_j) * dt,
        _Q_MU_J: f(p.mu_j),
        _Q_SIG_J: f(p.sigma_j),
        _Q_G_DRIFT_DT: (f(p.r) - f(p.q) - 0.5 * sigma_cv**2) * dt,
        _Q_SIG_CV: sigma_cv,
        _Q_SQRT_DT: jnp.sqrt(dt),
    }
    for i, v in vals.items():
        vec = vec.at[i].set(v)
    # Binomial jump-count CDF table (see _binom_count_cdf / _svj_kernel).
    cdf = _binom_count_cdf(vals[_Q_LAM_DT], num_steps)
    return jnp.concatenate([vec, cdf])


def _qe_variance_step(v, u_v, theta, e_kdt, var1, var2):
    """Andersen QE variance transition v → v' from one uniform (shared by
    the PRNG and draws QE kernels; scan twin: simulate.py:319-343)."""
    m = theta + (v - theta) * e_kdt
    s2 = v * var1 + var2
    psi = s2 / jnp.maximum(m * m, 1e-20)

    two_over_psi = 2.0 / jnp.maximum(psi, 1e-12)
    b2 = jnp.maximum(
        two_over_psi - 1.0
        + jnp.sqrt(jnp.maximum(two_over_psi, 1e-12))
        * jnp.sqrt(jnp.maximum(two_over_psi - 1.0, 0.0)), 0.0)
    a = m / (1.0 + b2)
    z_v = _ndtri_kernel(u_v)
    v_quad = a * (jnp.sqrt(b2) + z_v) ** 2

    p_mass = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 0.999)
    beta = (1.0 - p_mass) / jnp.maximum(m, 1e-20)
    u_clip = jnp.clip(u_v, 1e-7, 1.0 - 1e-7)
    v_exp = jnp.where(
        u_v <= p_mass, 0.0,
        jnp.log((1.0 - p_mass) / jnp.maximum(1.0 - u_clip, 1e-12))
        / jnp.maximum(beta, 1e-20))

    return jnp.where(psi <= jnp.float32(_QE_PSI_C), v_quad, v_exp)


def _svj_qe_kernel(seed_ref, p_ref, *out_refs,
                   num_steps: int, rows: int, half_grid: int,
                   companion: bool, n_branch: int):
    """One path block of the fused QE simulator (scan twin:
    ops/simulate.py:simulate_terminal_qe).

    Sampling is reorganized for the VPU relative to the scan twin — the
    LAW is unchanged (this twin pair is pinned statistically; the
    bit-pinned Sobol pair lives in the draws kernels):

    * The quadratic branch's normal comes straight from the Box-Muller
      pair that also yields z_x — the per-step Acklam inverse-CDF
      (1 log, 1 sqrt, 2 rational evals, 2 divides) is gone. Andersen's
      single-uniform construction matters for QMC inputs (monotone
      transport of the Sobol dim); under an in-kernel PRNG the branch
      choice is deterministic given v, so an independent N(0,1) for the
      quadratic branch plus the same shared uniform for the exponential
      branch samples the *identical* transition law.
    * Merton jumps use the compound identity taken to its end (see
      _svj_kernel): the total count is Binomial(num_steps, λ·dt), drawn
      ONCE per path by inverting the packed CDF table, and ONE
      end-of-path normal materializes the summed size — no per-step jump
      uniform, compare, or count carry at all.
    * The variance-transition algebra is division-minimized (5 → 3
      divides, 3 → 2 sqrts): the ψ-regime compare is s² ≤ 1.5·m² (no
      divide), √t·√(t−1) fuses into one √(t(t−1)), and the exponential
      branch folds β = (1−p)/m into a single m·log(·)/(1−p).

    Draw budget: one (3, rows, 128) block per step — (u0,u1) → BM →
    (z_x, z_v); u2 = exponential-branch uniform. z_x is negated on the antithetic branch; z_v and both
    uniforms are shared, so the variance path is identical across the
    pair (the scan twin's convention) — and because it IS identical,
    this kernel computes BOTH antithetic branches in ONE grid block
    (`pair_fused=True`): one variance transition, one draw block, and
    one BM per *pair* of path-steps, with only the cheap log-spot
    update duplicated. The variance step is ~60% of the per-step cost,
    so pair fusion nearly halves it. Measured on v5e at 2^22 paths ×
    1024 steps: 10.9 G (Acklam baseline) → 14.1 G (cheap sampling) →
    27.2 G (pair fusion) → 45.1 G (`_sincos_2pi` poly Box-Muller) →
    45.9 G (round-5 Binomial jump draw — flat: this kernel is bound by
    the variance transition's sqrt/div chain, not by draws; see
    benchmarks/ROOFLINE_r5.json, where QE carries the family's largest
    remaining headroom).
    """
    nb = n_branch
    if nb == 2:
        s_ref = (out_refs[0], out_refs[1])
        v_ref = out_refs[2]
        g_ref = (out_refs[3], out_refs[4])
        signs = (1.0, -1.0)
    else:
        s_ref, v_ref, g_ref = (out_refs[0],), out_refs[1], (out_refs[2],)
        signs = (1.0,)
    pair = pl.program_id(0)
    # Mixed (not added): see _svj_kernel.
    pltpu.prng_seed(seed_ref[0], pair)

    shape = (rows, LANES)
    e_kdt = p_ref[_Q_EKDT]
    theta = p_ref[_Q_THETA]
    var1, var2 = p_ref[_Q_VAR1], p_ref[_Q_VAR2]
    k0, k1, k2, k34 = p_ref[_Q_K0], p_ref[_Q_K1], p_ref[_Q_K2], p_ref[_Q_K34]
    drift_dt = p_ref[_Q_DRIFT_DT]
    mu_j, sig_j = p_ref[_Q_MU_J], p_ref[_Q_SIG_J]
    g_drift_dt = p_ref[_Q_G_DRIFT_DT]
    sig_cv = p_ref[_Q_SIG_CV]
    sqrt_dt = p_ref[_Q_SQRT_DT]
    psi_c = jnp.float32(_QE_PSI_C)

    def body(_, carry):
        log_s, v, log_g = carry
        bits = pltpu.prng_random_bits((3, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(3)]
        z_x, z_v = _boxmuller(u[0], u[1])
        u_v = u[2]        # exponential-branch uniform (shared)

        # ── variance transition (law = _qe_variance_step, fast algebra;
        #    ONE evaluation serves the whole antithetic pair) ──
        m = theta + (v - theta) * e_kdt
        s2 = v * var1 + var2
        m2 = m * m
        t = jnp.maximum(2.0 * m2 / jnp.maximum(s2, 1e-30), 1.0)  # 2/ψ
        b2 = t - 1.0 + jnp.sqrt(t * (t - 1.0))
        a = m / (1.0 + b2)
        v_quad = a * (jnp.sqrt(b2) + z_v) ** 2
        p_mass = jnp.clip((s2 - m2) / jnp.maximum(s2 + m2, 1e-30),
                          0.0, 0.999)
        one_m_p = 1.0 - p_mass                    # ≥ 1e-3 after the clip
        u_clip = jnp.minimum(u_v, 1.0 - 1e-7)     # u > 0 by construction
        v_exp = jnp.where(
            u_v <= p_mass, 0.0,
            m * jnp.log(one_m_p / (1.0 - u_clip)) / one_m_p)
        v_next = jnp.where(s2 <= psi_c * m2, v_quad, v_exp)

        # ── log-spot update (central K-scheme; jumps at end of path) ──
        vol = jnp.sqrt(jnp.maximum(k34 * (v + v_next), 0.0))
        base = drift_dt + k0 + k1 * v + k2 * v_next
        log_s = tuple(log_s[i] + base + vol * (signs[i] * z_x)
                      for i in range(nb))
        if companion:
            log_g = tuple(log_g[i] + g_drift_dt
                          + sig_cv * (signs[i] * z_x) * sqrt_dt
                          for i in range(nb))
        return log_s, v_next, log_g

    # log(S/S0) carry (see ops/simulate.py on f32 drift quantization).
    zeros = jnp.zeros(shape, jnp.float32)
    init = ((zeros,) * nb, jnp.full(shape, p_ref[_Q_V0], jnp.float32),
            (zeros,) * nb)
    log_s, v, log_g = jax.lax.fori_loop(0, num_steps, body, init)

    # Compound jump total: one uniform inverts the Binomial count CDF,
    # one normal materializes the summed size (reference semantics:
    # -Z_jump_size on the antithetic branch, monte_carlo.py:318-324).
    bits = pltpu.prng_random_bits((3, rows, LANES))
    n_jump = _count_from_u(_bits_to_uniform(bits[0]), p_ref, _Q_NPARAMS)
    z_total, _ = _boxmuller(_bits_to_uniform(bits[1]),
                            _bits_to_uniform(bits[2]))
    jump_body = sig_j * jnp.sqrt(n_jump) * z_total

    spot = p_ref[_Q_SPOT]
    for i in range(nb):
        s_ref[i][:] = spot * jnp.exp(log_s[i] + mu_j * n_jump
                                     + signs[i] * jump_body)
        if companion:
            g_ref[i][:] = spot * jnp.exp(log_g[i])
        else:
            g_ref[i][:] = jnp.zeros(shape, jnp.float32)
    v_ref[:] = v


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_steps", "antithetic", "companion",
                     "rows"),
)
def svj_terminal_qe_pallas(
    params: SVJParams,
    spot,
    T,
    seed,
    *,
    num_paths: int,
    num_steps: int,
    antithetic: bool = True,
    companion: bool = False,
    rows: int = 128,
) -> Tuple[Array, Array, Optional[Array]]:
    """Fused-TPU-kernel drop-in for `simulate.simulate_terminal_qe`.

    Same calling convention and output layout as `svj_terminal_pallas`.
    QE at ~16 steps matches the COS oracle where Euler needs ~1000
    (tests/test_qe_scheme.py), so this kernel is the accuracy-normalized
    throughput champion: fewer steps × the fused-kernel step rate.
    """
    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    padded = half_grid * block_paths

    kernel = functools.partial(
        _svj_qe_kernel, num_steps=num_steps, rows=rows,
        half_grid=half_grid, companion=companion, n_branch=n_branch,
    )
    out_shape = jax.ShapeDtypeStruct((half_grid * rows, LANES), jnp.float32)
    block_spec = pl.BlockSpec((rows, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    # Pair-fused layout: grid = half_grid; each block writes both
    # antithetic branches (s+, s−, shared v, g+, g−) — see the kernel.
    n_out = 2 * n_branch + 1
    outs = pl.pallas_call(
        kernel,
        grid=(half_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # packed QE params
        ],
        out_specs=(block_spec,) * n_out,
        out_shape=(out_shape,) * n_out,
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), _pack_qe_params(params, spot, T,
                                                      num_steps))

    def take(arrs):
        return jnp.stack([a.reshape(padded)[:num_paths] for a in arrs])

    if antithetic:
        s = take(outs[:2])
        v = take((outs[2], outs[2]))   # variance path shared by the pair
        g = take(outs[3:5]) if companion else None
    else:
        s = take(outs[:1])
        v = take((outs[1],))
        g = take(outs[2:3]) if companion else None
    return s, v, g


def _svj_qe_draws_kernel(*refs, chunk: int, num_steps: int, rows: int,
                         n_branch: int, companion: bool, rng_jumps: bool):
    """QE recursion fed by pre-drawn randoms streaming from HBM.

    The QE twin of `_svj_draws_kernel`: draws are (z_x, u_v, z_js) blocks in
    steps-major chunks (u_v consumed as raw uniforms by the variance
    transition); jump-occurrence uniforms come from the hardware PRNG when
    rng_jumps (seeded per grid cell, shared across the antithetic pair) or
    from a fourth streamed array otherwise. Carry in VMEM scratch across
    step chunks; outputs written on the last chunk; step padding masked.
    """
    if rng_jumps:
        (seed_ref, p_ref, zx_ref, uv_ref, zjs_ref,
         s_ref, v_ref, g_ref, ls_s, v_s, lg_s) = refs
        uj_ref = None
        cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], cell)
    else:
        (p_ref, zx_ref, uv_ref, uj_ref, zjs_ref,
         s_ref, v_ref, g_ref, ls_s, v_s, lg_s) = refs
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    shape = (n_branch, rows, LANES)

    @pl.when(c == 0)
    def _init():
        ls_s[:] = jnp.zeros(shape, jnp.float32)  # log(S/S0) carry
        v_s[:] = jnp.full(shape, p_ref[_Q_V0], jnp.float32)
        lg_s[:] = jnp.zeros(shape, jnp.float32)

    e_kdt = p_ref[_Q_EKDT]
    theta = p_ref[_Q_THETA]
    var1, var2 = p_ref[_Q_VAR1], p_ref[_Q_VAR2]
    k0, k1, k2, k34 = p_ref[_Q_K0], p_ref[_Q_K1], p_ref[_Q_K2], p_ref[_Q_K34]
    drift_dt = p_ref[_Q_DRIFT_DT]
    lam_dt = p_ref[_Q_LAM_DT]
    mu_j, sig_j = p_ref[_Q_MU_J], p_ref[_Q_SIG_J]
    g_drift_dt = p_ref[_Q_G_DRIFT_DT]
    sig_cv = p_ref[_Q_SIG_CV]
    sqrt_dt = p_ref[_Q_SQRT_DT]

    sign = (1 - 2 * jax.lax.broadcasted_iota(
        jnp.int32, (n_branch, 1, 1), 0)).astype(jnp.float32)

    def body(i, carry):
        log_s, v, log_g = carry
        z_x = zx_ref[i] * sign
        z_js = zjs_ref[i] * sign
        u_v = uv_ref[i]                 # shared across the antithetic pair
        if rng_jumps:
            u_jump = _bits_to_uniform(pltpu.prng_random_bits((rows, LANES)))
        else:
            u_jump = uj_ref[i]

        v_next = _qe_variance_step(v, u_v, theta, e_kdt, var1, var2)
        jump = jnp.where(u_jump < lam_dt, mu_j + sig_j * z_js, 0.0)
        diff_var = jnp.maximum(k34 * (v + v_next), 0.0)
        new_log_s = (log_s + drift_dt + k0 + k1 * v + k2 * v_next
                     + jnp.sqrt(diff_var) * z_x + jump)
        valid = (c * chunk + i) < num_steps  # step-padding mask
        log_s = jnp.where(valid, new_log_s, log_s)
        v = jnp.where(valid, v_next, v)
        if companion:
            log_g = jnp.where(valid,
                              log_g + g_drift_dt + sig_cv * z_x * sqrt_dt,
                              log_g)
        return log_s, v, log_g

    carry = (ls_s[:], v_s[:], lg_s[:])
    log_s, v, log_g = jax.lax.fori_loop(0, chunk, body, carry)
    ls_s[:] = log_s
    v_s[:] = v
    lg_s[:] = log_g

    @pl.when(c == n_chunks - 1)
    def _finish():
        spot = p_ref[_Q_SPOT]
        s_ref[:] = spot * jnp.exp(log_s)
        v_ref[:] = v
        if companion:
            g_ref[:] = spot * jnp.exp(log_g)
        else:
            g_ref[:] = jnp.zeros(shape, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("antithetic", "companion", "rows", "chunk",
                     "steps_major"),
)
def svj_terminal_qe_from_draws_pallas(
    params: SVJParams,
    spot,
    T,
    z_x: Array,
    u_v: Array,
    u_jump: Optional[Array],
    z_js: Array,
    *,
    seed=0,
    antithetic: bool = True,
    companion: bool = False,
    rows: int = 16,
    chunk: int = 32,
    steps_major: bool = False,
) -> Tuple[Array, Array, Optional[Array]]:
    """Fused-kernel drop-in for `simulate.simulate_terminal_qe_from_draws`.

    Completes the scheme × driver × backend matrix: the Sobol-driven QE
    path runs fused like the others. Deterministic given the draws when
    u_jump is supplied (pinned bit-close to the scan twin on CPU);
    u_jump=None draws jump uniforms from the hardware PRNG in-kernel.
    """
    if steps_major:
        num_steps, num_paths = z_x.shape
    else:
        num_paths, num_steps = z_x.shape
    n_chunks = max(1, -(-num_steps // chunk))
    steps_pad = n_chunks * chunk
    block_paths = rows * LANES
    n_blocks = max(1, -(-num_paths // block_paths))
    r_tot = n_blocks * rows
    padded_paths = n_blocks * block_paths
    n_branch = 2 if antithetic else 1

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if not steps_major:
            x = x.T  # (steps, paths)
        x = jnp.pad(x, ((0, steps_pad - num_steps),
                        (0, padded_paths - num_paths)))
        return x.reshape(steps_pad, r_tot, LANES)

    rng_jumps = u_jump is None
    kernel = functools.partial(
        _svj_qe_draws_kernel, chunk=chunk, num_steps=num_steps, rows=rows,
        n_branch=n_branch, companion=companion, rng_jumps=rng_jumps)
    in_spec = pl.BlockSpec((chunk, rows, LANES), lambda b, c: (c, b, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_branch, rows, LANES), lambda b, c: (0, b, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_branch, r_tot, LANES), jnp.float32)
    scratch = pltpu.VMEM((n_branch, rows, LANES), jnp.float32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    p_vec = _pack_qe_params(params, spot, T, num_steps)
    if rng_jumps:
        inputs = (jnp.asarray([seed], jnp.int32), p_vec,
                  prep(z_x), prep(u_v), prep(z_js))
        in_specs = [smem, smem, in_spec, in_spec, in_spec]
    else:
        inputs = (p_vec, prep(z_x), prep(u_v), prep(u_jump), prep(z_js))
        in_specs = [smem, in_spec, in_spec, in_spec, in_spec]

    s, v, g = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[scratch, scratch, scratch],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(*inputs)

    def split(x):
        return x.reshape(n_branch, padded_paths)[:, :num_paths]

    return split(s), split(v), (split(g) if companion else None)


# ─────────────────────────────────────────────────────────────────────────────
# SVJ path-statistics kernel (exotics hot path)
# ─────────────────────────────────────────────────────────────────────────────
def _svj_stats_kernel(seed_ref, p_ref, s_ref, avg_ref, lavg_ref, max_ref,
                      min_ref, surv_ref, g_ref, gavg_ref, glavg_ref, gmax_ref,
                      gmin_ref, gsurv_ref, *, num_steps: int, rows: int,
                      half_grid: int, companion: bool, bridge: bool,
                      bridge_up: bool, corridor: bool, window):
    """Fused SVJ simulation + running path functionals.

    Tracks per-path arithmetic sum, log-sum (geometric mean), and running
    max/min of log S for the SVJ leg and the GBM companion leg — everything
    the Asian/barrier/lookback payoffs need — in one pass with zero HBM
    traffic for intermediates (the scan-based tracker in ops/exotics.py is
    the differentiable twin; tests pin the two on TPU). bridge=True also
    accumulates the Brownian-bridge log-survival weight against the
    barrier at log(B/S0) = p[_P_BRIDGE_B] (same algebra as the scan twin:
    SVJ leg on its pre-step local variance, companion on v0; endpoint
    breach → -inf), enabling exact continuously-monitored barriers at
    kernel speed.
    """
    block = pl.program_id(0)
    pair = block % half_grid
    # Mixed (not added) so engines with adjacent seeds don't alias block
    # streams: seed s block b must differ from seed s+1 block b-1.
    pltpu.prng_seed(seed_ref[0], pair)
    sign = jnp.where(block < half_grid, 1.0, -1.0).astype(jnp.float32)

    shape = (rows, LANES)
    spot = p_ref[_P_SPOT]
    log_spot = jnp.log(spot)
    dt = p_ref[_P_DT]
    sqrt_dt = p_ref[_P_SQRT_DT]
    kappa, theta, xi = p_ref[_P_KAPPA], p_ref[_P_THETA], p_ref[_P_XI]
    rho, rho_perp = p_ref[_P_RHO], p_ref[_P_RHO_PERP]
    lam_dt = p_ref[_P_LAM_DT]
    mu_j, sig_j = p_ref[_P_MU_J], p_ref[_P_SIG_J]
    drift_dt = p_ref[_P_DRIFT_DT]
    g_drift_dt = p_ref[_P_G_DRIFT_DT]
    sig_cv = p_ref[_P_SIG_CV]
    b_log = p_ref[_P_BRIDGE_B]
    l_log = p_ref[_P_BRIDGE_L]

    def surv_inc(x_old, x_new, var_step):
        # log P(no within-step crossing | endpoints live), -inf on breach.
        # Identical algebra to ops/exotics.py:surv_increment (the twin).
        if corridor:
            # Double barrier: LITERALLY the scan twin's function (pure
            # jnp, traces fine inside the kernel) — the image-series
            # algebra cannot drift between the pair.
            from mcos_tpu.ops.exotics import corridor_surv_increment

            return corridor_surv_increment(x_old, x_new, var_step, dt,
                                           l_log, b_log)
        if bridge_up:
            d_old, d_new = b_log - x_old, b_log - x_new
        else:
            d_old, d_new = x_old - b_log, x_new - b_log
        dead = (d_old <= 0.0) | (d_new <= 0.0)
        p_cross = jnp.exp(jnp.minimum(
            -2.0 * d_old * d_new / jnp.maximum(var_step * dt, 1e-20), 0.0))
        return jnp.where(dead, -jnp.inf,
                         jnp.log1p(-jnp.minimum(p_cross, 1.0 - 1e-7)))

    def one_step(carry, z1, z2, z_js, u_jump, idx):
        (log_s, v, sum_s, sum_l, max_l, min_l, l_surv,
         log_g, g_sum_s, g_sum_l, g_max_l, g_min_l, g_l_surv) = carry
        v_pos = jnp.maximum(v, 0.0)
        sqrt_v = jnp.sqrt(v_pos)
        dw1 = z1 * sqrt_dt
        dw2 = rho * dw1 + rho_perp * z2 * sqrt_dt
        jump = jnp.where(u_jump < lam_dt, mu_j + sig_j * z_js, 0.0)

        x_prev = log_s
        log_s = log_s + (drift_dt - 0.5 * v_pos * dt) + sqrt_v * dw1 + jump
        v = jnp.maximum(v_pos + kappa * (theta - v_pos) * dt
                        + xi * sqrt_v * dw2, 0.0)
        sum_s = sum_s + jnp.exp(log_s)
        sum_l = sum_l + log_s
        max_l = jnp.maximum(max_l, log_s)
        min_l = jnp.minimum(min_l, log_s)
        if bridge:
            inc = surv_inc(x_prev, log_s, jnp.maximum(v_pos, 1e-12))
            if window is not None:
                # window barrier: monitoring restricted to steps
                # window[0]..window[1]-1 (static ints; same gating as the
                # scan twin — steps outside contribute log-weight 0)
                in_win = (idx >= window[0]) & (idx < window[1])
                inc = jnp.where(in_win, inc, 0.0)
            l_surv = l_surv + inc
        if companion:
            x_prev_g = log_g
            log_g = log_g + g_drift_dt + sig_cv * dw1
            g_sum_s = g_sum_s + jnp.exp(log_g)
            g_sum_l = g_sum_l + log_g
            g_max_l = jnp.maximum(g_max_l, log_g)
            g_min_l = jnp.minimum(g_min_l, log_g)
            if bridge:
                g_inc = surv_inc(x_prev_g, log_g, sig_cv * sig_cv)
                if window is not None:
                    in_win = (idx >= window[0]) & (idx < window[1])
                    g_inc = jnp.where(in_win, g_inc, 0.0)
                g_l_surv = g_l_surv + g_inc
        return (log_s, v, sum_s, sum_l, max_l, min_l, l_surv,
                log_g, g_sum_s, g_sum_l, g_max_l, g_min_l, g_l_surv)

    def body(it, carry):
        # 2 steps per iteration with fully-utilized Box-Muller pairs
        # (same layout as _svj_kernel; +12% measured).
        bits = pltpu.prng_random_bits((8, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(8)]
        z_a, z_b = _boxmuller(u[0], u[1])
        z_c, z_d = _boxmuller(u[2], u[3])
        z_e, z_f = _boxmuller(u[4], u[5])
        carry = one_step(carry, z_a * sign, z_b * sign, z_c * sign, u[6],
                         2 * it)
        carry = one_step(carry, z_d * sign, z_e * sign, z_f * sign, u[7],
                         2 * it + 1)
        return carry

    # log(S/S0) carry (see ops/simulate.py on f32 drift quantization);
    # running sums track exp(rel) and rel, spot scales at materialization.
    zeros = jnp.zeros(shape, jnp.float32)
    init = (zeros,
            jnp.full(shape, p_ref[_P_V0], jnp.float32),
            zeros, zeros,
            jnp.full(shape, -jnp.inf, jnp.float32),
            jnp.full(shape, jnp.inf, jnp.float32),
            zeros,
            zeros,
            zeros, zeros,
            jnp.full(shape, -jnp.inf, jnp.float32),
            jnp.full(shape, jnp.inf, jnp.float32),
            zeros)
    carry = jax.lax.fori_loop(0, num_steps // 2, body, init)
    if num_steps % 2 == 1:  # static tail step
        bits = pltpu.prng_random_bits((5, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(5)]
        z1, z2 = _boxmuller(u[0], u[1])
        z_js, _ = _boxmuller(u[2], u[3])
        carry = one_step(carry, z1 * sign, z2 * sign, z_js * sign, u[4],
                         jnp.int32(num_steps - 1))
    (log_s, _v, sum_s, sum_l, max_l, min_l, l_surv,
     log_g, g_sum_s, g_sum_l, g_max_l, g_min_l, g_l_surv) = carry

    inv_n = 1.0 / jnp.float32(num_steps)
    zero = jnp.zeros(shape, jnp.float32)
    s_ref[:] = spot * jnp.exp(log_s)
    avg_ref[:] = spot * (sum_s * inv_n)
    lavg_ref[:] = log_spot + sum_l * inv_n
    max_ref[:] = spot * jnp.exp(max_l)
    min_ref[:] = spot * jnp.exp(min_l)
    surv_ref[:] = l_surv if bridge else zero
    if companion:
        g_ref[:] = spot * jnp.exp(log_g)
        gavg_ref[:] = spot * (g_sum_s * inv_n)
        glavg_ref[:] = log_spot + g_sum_l * inv_n
        gmax_ref[:] = spot * jnp.exp(g_max_l)
        gmin_ref[:] = spot * jnp.exp(g_min_l)
        gsurv_ref[:] = g_l_surv if bridge else zero
    else:
        g_ref[:] = zero
        gavg_ref[:] = zero
        glavg_ref[:] = zero
        gmax_ref[:] = zero
        gmin_ref[:] = zero
        gsurv_ref[:] = zero


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_steps", "antithetic", "companion",
                     "rows", "bridge", "bridge_up", "corridor", "window"),
)
def svj_path_stats_pallas(
    params: SVJParams,
    spot,
    T,
    seed,
    *,
    num_paths: int,
    num_steps: int,
    antithetic: bool = True,
    companion: bool = True,
    rows: int = 32,
    bridge: bool = False,
    bridge_up: bool = True,
    bridge_log_b=0.0,
    corridor: bool = False,
    bridge_log_l=0.0,
    window=None,
):
    """Fused-kernel drop-in for `ops.exotics.simulate_path_stats`.

    Returns the same dict layout ((n_branch, num_paths) arrays): s_final,
    avg, log_avg, max_s, min_s (+ companion g_* when companion=True;
    + log_surv/g_log_surv Brownian-bridge survival weights when
    bridge=True, barrier at log(B/S0) = bridge_log_b, side = bridge_up;
    corridor=True monitors BOTH barriers (bridge_log_l, bridge_log_b) via
    the shared image-series increment — double knock-outs at kernel
    speed; window=(w0, w1) static step indices restrict monitoring to
    steps w0..w1-1 — partial/window barriers, same gating as the scan
    twin).
    """
    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    grid = half_grid * n_branch
    padded = half_grid * block_paths

    kernel = functools.partial(
        _svj_stats_kernel, num_steps=num_steps, rows=rows,
        half_grid=half_grid, companion=companion, bridge=bridge,
        bridge_up=bridge_up, corridor=corridor, window=window)
    out_shape = jax.ShapeDtypeStruct((grid * rows, LANES), jnp.float32)
    block_spec = pl.BlockSpec((rows, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_specs=(block_spec,) * 12,
        out_shape=(out_shape,) * 12,
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32),
      _pack_params(params, spot, T, num_steps, bridge_log_b=bridge_log_b,
                   bridge_log_l=bridge_log_l))

    def split(x):
        return x.reshape(n_branch, padded)[:, :num_paths]

    names = ("s_final", "avg", "log_avg", "max_s", "min_s", "log_surv",
             "g_final", "g_avg", "g_log_avg", "g_max", "g_min", "g_log_surv")
    stats = {name: split(x) for name, x in zip(names, outs)}
    if not companion:
        for k in ("g_final", "g_avg", "g_log_avg", "g_max", "g_min",
                  "g_log_surv"):
            del stats[k]
    if not bridge:
        stats.pop("log_surv")
        stats.pop("g_log_surv", None)
    return stats


# ─────────────────────────────────────────────────────────────────────────────
# GBM kernel (constant-vol fast path; headline throughput benchmark)
# ─────────────────────────────────────────────────────────────────────────────
def _gbm_kernel(seed_ref, p_ref, *s_refs,
                num_steps: int, rows: int, n_branch: int):
    """Lognormal path simulator: d log S = (r−q−σ²/2)dt + σ dW.

    One Box-Muller pair drives two consecutive steps, and — like the QE
    kernel — the antithetic pair is fused into ONE grid block: GBM has no
    shared state across the pair, but the draws and the Box-Muller ARE
    shared (the minus branch is −z), so one block advances both branches
    with one draw block and one BM per two steps, duplicating only the
    log-spot FMA. Per-output-path-step budget: ~¼ log + ¼ sqrt +
    ¼ sincos + ½ draw + 2 FMA (half the pre-fusion transcendental bill;
    measured v5e sustained 55.7 → 98.5 G path-steps/s at 2^22 × 1024;
    the `_sincos_2pi` poly Box-Muller lifts it further to 232G —
    at the serial-issue VPU roofline, benchmarks/roofline.py).
    The step loop is kept honest (no algebraic collapse of ΣZ) so the
    kernel generalizes to path-dependent payoffs.
    """
    # One block per antithetic pair; branch signs live in-block.
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    signs = (1.0, -1.0)[:n_branch]

    shape = (rows, LANES)
    drift_dt = p_ref[_P_DRIFT_DT]
    sig_sqrt_dt = p_ref[_P_SIG_CV] * p_ref[_P_SQRT_DT]

    n_pairs = (num_steps + 1) // 2
    odd_tail = num_steps % 2 == 1

    def body(i, log_s):
        bits = pltpu.prng_random_bits((2, rows, LANES))
        z_a, z_b = _boxmuller(_bits_to_uniform(bits[0]),
                              _bits_to_uniform(bits[1]))
        step_a = sig_sqrt_dt * z_a
        step_b = sig_sqrt_dt * z_b
        log_s = tuple(ls + drift_dt + sg * step_a
                      for ls, sg in zip(log_s, signs))
        if odd_tail:
            # Last pair contributes a single step.
            take_b = i < n_pairs - 1
            log_s = tuple(ls + jnp.where(take_b, drift_dt + sg * step_b, 0.0)
                          for ls, sg in zip(log_s, signs))
        else:
            log_s = tuple(ls + drift_dt + sg * step_b
                          for ls, sg in zip(log_s, signs))
        return log_s

    # log(S/S0) carry (see ops/simulate.py on f32 drift quantization).
    log_s = jax.lax.fori_loop(
        0, n_pairs, body, (jnp.zeros(shape, jnp.float32),) * n_branch)
    for k in range(n_branch):
        s_refs[k][:] = p_ref[_P_SPOT] * jnp.exp(log_s[k])


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_steps", "antithetic", "rows"),
)
def gbm_terminal_pallas(
    spot,
    sigma,
    r,
    q,
    T,
    seed,
    *,
    num_paths: int,
    num_steps: int,
    antithetic: bool = True,
    rows: int = DEFAULT_ROWS,
) -> Array:
    """Terminal spots of a GBM, shape (n_branch, num_paths)."""
    f = lambda x: jnp.asarray(x, jnp.float32)
    dt = f(T) / num_steps
    p_vec = jnp.zeros((_P_NPARAMS,), jnp.float32)
    p_vec = p_vec.at[_P_SPOT].set(f(spot))
    p_vec = p_vec.at[_P_SQRT_DT].set(jnp.sqrt(dt))
    p_vec = p_vec.at[_P_DRIFT_DT].set((f(r) - f(q) - 0.5 * f(sigma) ** 2) * dt)
    p_vec = p_vec.at[_P_SIG_CV].set(f(sigma))

    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    padded = half_grid * block_paths

    kernel = functools.partial(_gbm_kernel, num_steps=num_steps, rows=rows,
                               n_branch=n_branch)
    block_spec = pl.BlockSpec((rows, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((half_grid * rows, LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(half_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(block_spec,) * n_branch,
        out_shape=(out_shape,) * n_branch,
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), p_vec)
    return jnp.stack([o.reshape(padded)[:num_paths] for o in outs])


# ─────────────────────────────────────────────────────────────────────────────
# Heston-Hull-White kernel (3-factor: spot, variance, short rate)
# ─────────────────────────────────────────────────────────────────────────────
# Packed-parameter layout for the HHW kernel.
(_H_SPOT, _H_DT, _H_SQRT_DT, _H_KAPPA, _H_THETA, _H_XI, _H_V0, _H_Q,
 _H_EADT, _H_SOU, _H_B, _H_R0, _H_L21, _H_L22, _H_L31, _H_L32, _H_L33,
 _H_NPARAMS) = range(18)


def _hhw_kernel(seed_ref, p_ref, *out_refs,
                num_steps: int, rows: int, n_branch: int):
    """One path block of the fused Heston-Hull-White simulator
    (scan twin: ops/hhw.py:hhw_terminal — same recursion: full-truncation
    Heston, EXACT Ornstein-Uhlenbeck rate transitions, left-point
    money-market integral so D·S_T is an exact discrete martingale).

    Per 2 steps: 6 normals = 3 fully-used Box-Muller pairs (no uniforms —
    the hybrid carries no jumps), correlated through the packed 3x3
    Cholesky rows. The antithetic pair is fused into one grid block (see
    _svj_kernel): draws, Box-Muller, and the Cholesky mixes zv/zr are
    computed once per pair (they just flip sign); the (log S, v, r, ∫r)
    state duplicates per branch. Outputs the terminal-spot block and the
    pathwise discount block exp(-∫ r dt) per branch. Measured v5e
    sustained at 2^22 × 1024: 15.4 → 26.8 G path-steps/s with pair
    fusion → 42.2 G with the `_sincos_2pi` poly Box-Muller.
    """
    nb = n_branch
    s_ref = out_refs[0:nb]
    d_ref = out_refs[nb:2 * nb]
    signs = (1.0, -1.0)[:nb]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    shape = (rows, LANES)
    dt = p_ref[_H_DT]
    sqrt_dt = p_ref[_H_SQRT_DT]
    kappa, theta, xi = p_ref[_H_KAPPA], p_ref[_H_THETA], p_ref[_H_XI]
    q = p_ref[_H_Q]
    e_adt, s_ou, b = p_ref[_H_EADT], p_ref[_H_SOU], p_ref[_H_B]
    l21, l22 = p_ref[_H_L21], p_ref[_H_L22]
    l31, l32, l33 = p_ref[_H_L31], p_ref[_H_L32], p_ref[_H_L33]

    def one_step(log_s, v, r, int_r, z1, z2, z3):
        # Correlate: z1 drives spot; variance and rate mix through chol.
        # Mixes are linear in the normals, so they flip with the pair sign.
        zv = l21 * z1 + l22 * z2
        zr = l31 * z1 + l32 * z2 + l33 * z3
        new_s, new_v, new_r, new_i = [], [], [], []
        for k in range(nb):
            sg = signs[k]
            v_pos = jnp.maximum(v[k], 0.0)
            sqrt_v = jnp.sqrt(v_pos)
            new_s.append(log_s[k] + ((r[k] - q - 0.5 * v_pos) * dt
                                     + sqrt_v * (sg * z1) * sqrt_dt))
            new_v.append(jnp.maximum(
                v_pos + kappa * (theta - v_pos) * dt
                + xi * sqrt_v * (sg * zv) * sqrt_dt, 0.0))
            new_i.append(int_r[k] + r[k] * dt)  # left-point (martingale)
            new_r.append(b + (r[k] - b) * e_adt + s_ou * (sg * zr))
        return (tuple(new_s), tuple(new_v), tuple(new_r), tuple(new_i))

    def body(_, carry):
        log_s, v, r, int_r = carry
        bits = pltpu.prng_random_bits((6, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(6)]
        z_a, z_b = _boxmuller(u[0], u[1])
        z_c, z_d = _boxmuller(u[2], u[3])
        z_e, z_f = _boxmuller(u[4], u[5])
        log_s, v, r, int_r = one_step(log_s, v, r, int_r, z_a, z_b, z_c)
        log_s, v, r, int_r = one_step(log_s, v, r, int_r, z_d, z_e, z_f)
        return log_s, v, r, int_r

    zeros = jnp.zeros(shape, jnp.float32)
    init = ((zeros,) * nb,
            (jnp.full(shape, p_ref[_H_V0], jnp.float32),) * nb,
            (jnp.full(shape, p_ref[_H_R0], jnp.float32),) * nb,
            (zeros,) * nb)
    log_s, v, r, int_r = jax.lax.fori_loop(0, num_steps // 2, body, init)

    if num_steps % 2 == 1:  # static tail step
        bits = pltpu.prng_random_bits((4, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(4)]
        z1, z2 = _boxmuller(u[0], u[1])
        z3, _ = _boxmuller(u[2], u[3])
        log_s, v, r, int_r = one_step(log_s, v, r, int_r, z1, z2, z3)

    for k in range(nb):
        s_ref[k][:] = p_ref[_H_SPOT] * jnp.exp(log_s[k])
        d_ref[k][:] = jnp.exp(-int_r[k])


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_steps", "antithetic", "rows"),
)
def hhw_terminal_pallas(
    params,
    spot,
    T,
    seed,
    *,
    num_paths: int,
    num_steps: int,
    antithetic: bool = True,
    rows: int = 32,
) -> Tuple[Array, Array]:
    """Fused-TPU-kernel drop-in for `ops.hhw.hhw_terminal`.

    Returns (S_final, discount), each (n_branch, num_paths) — same
    contract and recursion as the scan twin; tests pin the statistics
    (and the exact-martingale invariant E[D S_T] = S0 e^{-qT} holds by
    the same left-point construction).
    """
    f = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    dt = f(T) / num_steps
    corr = jnp.array([[1.0, params.rho_sv, params.rho_sr],
                      [params.rho_sv, 1.0, params.rho_vr],
                      [params.rho_sr, params.rho_vr, 1.0]], jnp.float32)
    chol = jnp.linalg.cholesky(corr)
    e_adt = jnp.exp(-f(params.a) * dt)
    s_ou = f(params.sigma_r) * jnp.sqrt(
        (1.0 - e_adt**2) / jnp.maximum(2.0 * f(params.a), 1e-12))
    vals = {
        _H_SPOT: f(spot), _H_DT: dt, _H_SQRT_DT: jnp.sqrt(dt),
        _H_KAPPA: f(params.kappa), _H_THETA: f(params.theta),
        _H_XI: f(params.xi), _H_V0: f(params.v0), _H_Q: f(params.q),
        _H_EADT: e_adt, _H_SOU: s_ou, _H_B: f(params.b),
        _H_R0: f(params.r0), _H_L21: chol[1, 0], _H_L22: chol[1, 1],
        _H_L31: chol[2, 0], _H_L32: chol[2, 1], _H_L33: chol[2, 2],
    }
    p_vec = jnp.zeros((_H_NPARAMS,), jnp.float32)
    for idx, v in vals.items():
        p_vec = p_vec.at[idx].set(v)

    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    padded = half_grid * block_paths

    kernel = functools.partial(_hhw_kernel, num_steps=num_steps,
                               rows=rows, n_branch=n_branch)
    out_shape = jax.ShapeDtypeStruct((half_grid * rows, LANES), jnp.float32)
    block_spec = pl.BlockSpec((rows, LANES), lambda bk: (bk, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(half_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(block_spec,) * (2 * n_branch),
        out_shape=(out_shape,) * (2 * n_branch),
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), p_vec)

    def take(arrs):
        return jnp.stack([a.reshape(padded)[:num_paths] for a in arrs])

    return take(outs[0:n_branch]), take(outs[n_branch:2 * n_branch])


# ─────────────────────────────────────────────────────────────────────────────
# SVCJ kernel (correlated price/variance jumps; scan twin: ops/svcj.py)
# ─────────────────────────────────────────────────────────────────────────────
_C_SPOT, _C_V0, _C_DT, _C_SQRT_DT, _C_KAPPA, _C_THETA, _C_XI, _C_RHO, \
    _C_RHO_PERP, _C_LAM_DT, _C_MU_J, _C_SIG_J, _C_MU_V, _C_RHO_J, \
    _C_DRIFT_DT, _C_G_DRIFT_DT, _C_SIG_CV, _C_NPARAMS = range(18)


def _svcj_kernel(seed_ref, p_ref, *out_refs,
                 num_steps: int, rows: int, companion: bool, n_branch: int):
    """One path block of the fused SVCJ simulator (scan twin:
    ops/svcj.py:_svcj_step_core — same recursion, same antithetic
    convention: normals negate across the pair, jump uniforms AND
    exponential magnitudes are shared).

    Unlike the SVJ kernel, the compound-jump identity does NOT apply: the
    variance jump Z_v feeds back into the diffusion through v, so jumps
    must be applied per step. Per 2 steps: 10 uniforms — 3 fully-used
    Box-Muller pairs (z1/z2 pairs + the two jump-size normals), 2 shared
    jump-occurrence uniforms, 2 shared exponential uniforms. The
    antithetic pair is fused into one grid block (see _svj_kernel):
    draws, Box-Muller, the dW₂ mix, the jump indicator, and the
    exponential variance-jump magnitude are computed once per pair;
    (log S, v) state duplicates and the companion leg collapses to one
    odd Σσ_cv dW₁ accumulator.
    """
    nb = n_branch
    s_ref = out_refs[0:nb]
    v_ref = out_refs[nb:2 * nb]
    g_ref = out_refs[2 * nb:3 * nb]
    signs = (1.0, -1.0)[:nb]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    shape = (rows, LANES)
    dt = p_ref[_C_DT]
    sqrt_dt = p_ref[_C_SQRT_DT]
    kappa, theta, xi = p_ref[_C_KAPPA], p_ref[_C_THETA], p_ref[_C_XI]
    rho, rho_perp = p_ref[_C_RHO], p_ref[_C_RHO_PERP]
    lam_dt = p_ref[_C_LAM_DT]
    mu_j, sig_j = p_ref[_C_MU_J], p_ref[_C_SIG_J]
    mu_v, rho_j = p_ref[_C_MU_V], p_ref[_C_RHO_J]
    drift_dt = p_ref[_C_DRIFT_DT]
    g_drift_dt = p_ref[_C_G_DRIFT_DT]
    sig_cv = p_ref[_C_SIG_CV]

    def one_step(log_s, v, cv_w, z1, z2, z_js, u_jump, u_exp):
        dw1 = z1 * sqrt_dt
        dw2 = rho * dw1 + rho_perp * z2 * sqrt_dt
        jump_ind = u_jump < lam_dt
        z_v = mu_v * (-jnp.log(u_exp))          # Exp(mu_v), shared in pair
        jump_v = jnp.where(jump_ind, z_v, 0.0)
        jump_base = jnp.where(jump_ind, mu_j + rho_j * z_v, 0.0)
        jump_odd = jnp.where(jump_ind, sig_j * z_js, 0.0)  # flips with sign
        new_s, new_v = [], []
        for k in range(nb):
            sg = signs[k]
            v_pos = jnp.maximum(v[k], 0.0)
            sqrt_v = jnp.sqrt(v_pos)
            new_s.append(log_s[k] + (drift_dt - 0.5 * v_pos * dt)
                         + sqrt_v * (sg * dw1) + jump_base + sg * jump_odd)
            new_v.append(jnp.maximum(
                v_pos + kappa * (theta - v_pos) * dt
                + xi * sqrt_v * (sg * dw2) + jump_v, 0.0))
        if companion:
            cv_w = cv_w + sig_cv * dw1
        return tuple(new_s), tuple(new_v), cv_w

    def body(_, carry):
        log_s, v, cv_w = carry
        bits = pltpu.prng_random_bits((10, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(10)]
        z1a, z2a = _boxmuller(u[0], u[1])
        z1b, z2b = _boxmuller(u[2], u[3])
        zja, zjb = _boxmuller(u[4], u[5])
        log_s, v, cv_w = one_step(log_s, v, cv_w, z1a, z2a, zja, u[6], u[8])
        log_s, v, cv_w = one_step(log_s, v, cv_w, z1b, z2b, zjb, u[7], u[9])
        return log_s, v, cv_w

    zeros = jnp.zeros(shape, jnp.float32)
    init = ((zeros,) * nb,
            (jnp.full(shape, p_ref[_C_V0], jnp.float32),) * nb, zeros)
    log_s, v, cv_w = jax.lax.fori_loop(0, num_steps // 2, body, init)

    if num_steps % 2 == 1:  # static tail step
        bits = pltpu.prng_random_bits((6, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(6)]
        z1, z2 = _boxmuller(u[0], u[1])
        z_js, _ = _boxmuller(u[2], u[3])
        log_s, v, cv_w = one_step(log_s, v, cv_w, z1, z2, z_js, u[4], u[5])

    g_drift_total = g_drift_dt * jnp.float32(num_steps)
    for k in range(nb):
        s_ref[k][:] = p_ref[_C_SPOT] * jnp.exp(log_s[k])
        v_ref[k][:] = v[k]
        if companion:
            g_ref[k][:] = p_ref[_C_SPOT] * jnp.exp(g_drift_total
                                                   + signs[k] * cv_w)
        else:
            g_ref[k][:] = jnp.zeros(shape, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_steps", "antithetic", "companion",
                     "rows"),
)
def svcj_terminal_pallas(
    params,
    spot,
    T,
    seed,
    *,
    num_paths: int,
    num_steps: int,
    antithetic: bool = True,
    companion: bool = False,
    rows: int = 64,
):
    """Fused-TPU-kernel drop-in for `ops/svcj.py:svcj_terminal`.

    Returns (S_final, v_final, G_final or None), each (n_branch, num_paths);
    `params` is an SVCJParams. Same padding/slicing contract as
    `svj_terminal_pallas`.
    """
    f = lambda x: jnp.asarray(x, jnp.float32)
    dt = f(T) / num_steps
    k_bar = jnp.exp(f(params.mu_j) + 0.5 * f(params.sigma_j) ** 2) \
        / (1.0 - f(params.rho_j) * f(params.mu_v)) - 1.0
    sigma_cv = jnp.sqrt(f(params.v0))
    vals = {
        _C_SPOT: f(spot), _C_V0: f(params.v0), _C_DT: dt,
        _C_SQRT_DT: jnp.sqrt(dt), _C_KAPPA: f(params.kappa),
        _C_THETA: f(params.theta), _C_XI: f(params.xi),
        _C_RHO: f(params.rho),
        _C_RHO_PERP: jnp.sqrt(1.0 - f(params.rho) ** 2),
        _C_LAM_DT: f(params.lambda_j) * dt,
        _C_MU_J: f(params.mu_j), _C_SIG_J: f(params.sigma_j),
        _C_MU_V: f(params.mu_v), _C_RHO_J: f(params.rho_j),
        _C_DRIFT_DT: (f(params.r) - f(params.q)
                      - f(params.lambda_j) * k_bar) * dt,
        _C_G_DRIFT_DT: (f(params.r) - f(params.q)
                        - 0.5 * sigma_cv ** 2) * dt,
        _C_SIG_CV: sigma_cv,
    }
    p_vec = jnp.zeros((_C_NPARAMS,), jnp.float32)
    for idx, v in vals.items():
        p_vec = p_vec.at[idx].set(v)

    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    padded = half_grid * block_paths

    kernel = functools.partial(_svcj_kernel, num_steps=num_steps,
                               rows=rows, companion=companion,
                               n_branch=n_branch)
    out_shape = jax.ShapeDtypeStruct((half_grid * rows, LANES), jnp.float32)
    block_spec = pl.BlockSpec((rows, LANES), lambda bk: (bk, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(half_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(block_spec,) * (3 * n_branch),
        out_shape=(out_shape,) * (3 * n_branch),
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), p_vec)

    def take(arrs):
        return jnp.stack([a.reshape(padded)[:num_paths] for a in arrs])

    s = take(outs[0:n_branch])
    v = take(outs[n_branch:2 * n_branch])
    g = take(outs[2 * n_branch:3 * n_branch]) if companion else None
    return s, v, g


# ─────────────────────────────────────────────────────────────────────────────
# Time-dependent SVJ kernel (piecewise-constant θ(t), ξ(t), λ(t))
# ─────────────────────────────────────────────────────────────────────────────
def _svj_td_kernel(seed_ref, p_ref, td_ref, *out_refs,
                   num_steps: int, rows: int, companion: bool,
                   n_branch: int):
    """Time-dependent twin of `_svj_kernel` (see ops/tdsvj.py).

    `td_ref` is a (4, num_steps) f32 SMEM table with rows (θᵢ, ξᵢ, λᵢ·dt,
    drift_dtᵢ); the loop reads four scalars per step — noise against the
    (rows × 128) vector work. Everything else (two-steps-per-iteration
    Box-Muller pairing, fused antithetic pair per block, log(S/S0) carry)
    matches the constant-param kernel. The compound-jump identity survives
    time dependence: jump *sizes* are iid N(μ_J, σ_J²) regardless of
    arrival time, so only the count distribution picks up λᵢ — it is
    Poisson-binomial over the per-step pᵢ = λᵢ·dt, drawn ONCE per path by
    inverting the packed `_poisson_binom_cdf` table, and ONE end-of-path
    normal still materializes the summed sizes exactly.
    """
    nb = n_branch
    s_ref = out_refs[0:nb]
    v_ref = out_refs[nb:2 * nb]
    g_ref = out_refs[2 * nb:3 * nb]
    signs = (1.0, -1.0)[:nb]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    shape = (rows, LANES)
    spot = p_ref[_P_SPOT]
    dt = p_ref[_P_DT]
    sqrt_dt = p_ref[_P_SQRT_DT]
    kappa = p_ref[_P_KAPPA]
    rho, rho_perp = p_ref[_P_RHO], p_ref[_P_RHO_PERP]
    mu_j, sig_j = p_ref[_P_MU_J], p_ref[_P_SIG_J]
    g_drift_dt = p_ref[_P_G_DRIFT_DT]
    sig_cv = p_ref[_P_SIG_CV]

    # Hoisted scalar coefficient forms (see _svj_kernel).
    nhdt = jnp.float32(-0.5) * dt
    omk = 1.0 - kappa * dt
    kappa_dt = kappa * dt

    def one_step(step_idx, log_s, v, cv_w, z1, z2):
        theta_i = td_ref[0, step_idx]
        xi_i = td_ref[1, step_idx]
        drift_dt_i = td_ref[3, step_idx]
        ktheta_dt_i = kappa_dt * theta_i
        dw1 = z1 * sqrt_dt
        dw2 = rho * dw1 + rho_perp * z2 * sqrt_dt
        new_s, new_v = [], []
        for k in range(nb):
            sg = signs[k]
            # v carry is clamped ≥ 0 below and v0 ≥ 0, so no max() here.
            v_k = v[k]
            sqrt_v = jnp.sqrt(v_k)
            new_s.append(log_s[k] + (drift_dt_i + nhdt * v_k)
                         + sqrt_v * (sg * dw1))
            new_v.append(jnp.maximum(
                omk * v_k + ktheta_dt_i + xi_i * (sqrt_v * (sg * dw2)),
                0.0))
        if companion:
            cv_w = cv_w + sig_cv * dw1
        return tuple(new_s), tuple(new_v), cv_w

    def body(i, carry):
        log_s, v, cv_w = carry
        bits = pltpu.prng_random_bits((4, rows, LANES))
        u = [_bits_to_uniform(bits[j]) for j in range(4)]
        z_a, z_b = _boxmuller(u[0], u[1])
        z_c, z_d = _boxmuller(u[2], u[3])
        log_s, v, cv_w = one_step(2 * i, log_s, v, cv_w, z_a, z_b)
        log_s, v, cv_w = one_step(2 * i + 1, log_s, v, cv_w, z_c, z_d)
        return log_s, v, cv_w

    zeros = jnp.zeros(shape, jnp.float32)
    init = ((zeros,) * nb,
            (jnp.full(shape, p_ref[_P_V0], jnp.float32),) * nb,
            zeros)
    log_s, v, cv_w = jax.lax.fori_loop(0, num_steps // 2, body, init)

    if num_steps % 2 == 1:  # static tail step
        bits = pltpu.prng_random_bits((2, rows, LANES))
        u = [_bits_to_uniform(bits[j]) for j in range(2)]
        z1, z2 = _boxmuller(u[0], u[1])
        log_s, v, cv_w = one_step(num_steps - 1, log_s, v, cv_w, z1, z2)

    # Poisson-binomial count + compound jump total, once per path.
    bits = pltpu.prng_random_bits((3, rows, LANES))
    n_jump = _count_from_u(_bits_to_uniform(bits[0]), p_ref, _P_NPARAMS)
    z_total, _ = _boxmuller(_bits_to_uniform(bits[1]),
                            _bits_to_uniform(bits[2]))
    jump_mean = mu_j * n_jump
    jump_body = sig_j * jnp.sqrt(n_jump) * z_total

    g_drift_total = g_drift_dt * jnp.float32(num_steps)
    for k in range(nb):
        s_ref[k][:] = spot * jnp.exp(log_s[k] + jump_mean
                                     + signs[k] * jump_body)
        v_ref[k][:] = v[k]
        if companion:
            g_ref[k][:] = spot * jnp.exp(g_drift_total + signs[k] * cv_w)
        else:
            g_ref[k][:] = jnp.zeros(shape, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_steps", "antithetic", "companion",
                     "rows"),
)
def svj_terminal_td_pallas(
    params: SVJParams,
    theta_t: Array,
    xi_t: Array,
    lam_t: Array,
    spot,
    T,
    seed,
    *,
    num_paths: int,
    num_steps: int,
    antithetic: bool = True,
    companion: bool = False,
    rows: int = 64,
) -> Tuple[Array, Array, Optional[Array]]:
    """Fused-TPU-kernel drop-in for `tdsvj.simulate_terminal_td`.

    `theta_t/xi_t/lam_t` are (num_steps,) per-step levels (tdsvj.
    step_param_arrays). Same padding/slicing contract as
    `svj_terminal_pallas`; constant arrays reproduce that kernel's law
    (TPU-gated statistical pin in tests/test_pallas.py).
    """
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    dt = f32(T) / num_steps
    k_bar = jnp.exp(f32(params.mu_j) + 0.5 * f32(params.sigma_j) ** 2) - 1.0
    lam_t = f32(lam_t)
    td_table = jnp.stack([
        f32(theta_t),
        f32(xi_t),
        lam_t * dt,
        (f32(params.r) - f32(params.q) - lam_t * k_bar) * dt,
    ])
    # The packed vector's constant-λ count table doesn't apply here —
    # overwrite it with the Poisson-binomial CDF over the per-step λᵢ·dt.
    p_vec = _pack_params(params, spot, T, num_steps)
    p_vec = jnp.concatenate([p_vec[:_P_NPARAMS],
                             _poisson_binom_cdf(lam_t * dt)])

    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    padded = half_grid * block_paths

    kernel = functools.partial(
        _svj_td_kernel, num_steps=num_steps, rows=rows,
        companion=companion, n_branch=n_branch,
    )
    out_shape = jax.ShapeDtypeStruct((half_grid * rows, LANES), jnp.float32)
    block_spec = pl.BlockSpec((rows, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(half_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # packed scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (4, steps) td table
        ],
        out_specs=(block_spec,) * (3 * n_branch),
        out_shape=(out_shape,) * (3 * n_branch),
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), p_vec, td_table)

    def take(arrs):
        return jnp.stack([a.reshape(padded)[:num_paths] for a in arrs])

    s = take(outs[0:n_branch])
    v = take(outs[n_branch:2 * n_branch])
    g = take(outs[2 * n_branch:3 * n_branch]) if companion else None
    return s, v, g


# ─────────────────────────────────────────────────────────────────────────────
# Rough Bergomi Markovian-lift kernel
# ─────────────────────────────────────────────────────────────────────────────
def _rbergomi_lift_kernel(seed_ref, p_ref, cdg_ref, step_ref,
                          *out_refs, num_steps: int, rows: int,
                          n_factors: int, n_branch: int):
    """Fused rBergomi lift: the O(n·m) factor scan with in-kernel PRNG.

    One path block of `ops/rough.py:rbergomi_core_lifted`'s recursion
    (the scan twin — same tables, same update algebra, statistically
    pinned). The scan version is RNG/exp-bound on the XLA path (threefry
    ~10 ops/word); here the hardware PRNG makes draws nearly free, the
    m-factor state lives in vregs, and the per-step work is ~3m FMAs +
    one Box-Muller + one exp + one sqrt.

    SMEM inputs: p_ref = [eta, sqrt_dt, dt]; cdg_ref = (3, m) stacked
    (c, d, g); step_ref = (2, num_steps) per-step tables
    [ln ξ_i − ½η²·t_i^{2H}, sqrt_tail_left_i] (left-point convention,
    t_0 row first). Antithetic flips BOTH normals, so the variance path
    differs per branch — but the factor state is LINEAR in the draws
    (ys = Σ dᵏ g dW), so the minus branch's state is exactly −ys and the
    Gaussian mix w is odd too: the pair fuses into one grid block with
    ONE factor scan (the dominant 3m FMAs), duplicating only the
    exp/sqrt/accumulate tail (v_± = exp(±ηw + e_i)).

    Outputs per path per branch: I1 = Σ √v_i dW_{i+1} and I2 = Σ v_i dt
    — the Romano-Touzi sufficient statistics (payoffs assemble outside).
    """
    nb = n_branch
    i1_ref = out_refs[0:nb]
    i2_ref = out_refs[nb:2 * nb]
    signs = (1.0, -1.0)[:nb]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    shape = (rows, LANES)
    eta = p_ref[0]
    sqrt_dt = p_ref[1]
    dt = p_ref[2]

    def body(i, carry):
        ys, i1, i2 = carry
        bits = pltpu.prng_random_bits((2, rows, LANES))
        z_dw, z_zeta = _boxmuller(_bits_to_uniform(bits[0]),
                                  _bits_to_uniform(bits[1]))
        w = step_ref[1, i] * z_zeta
        for j in range(n_factors):
            w = w + cdg_ref[0, j] * ys[j]
        ew = eta * w                      # odd in the draws: flips per branch
        e_i = step_ref[0, i]
        dw = z_dw * sqrt_dt
        new_i1, new_i2 = [], []
        for k in range(nb):
            v = jnp.exp(signs[k] * ew + e_i)
            new_i1.append(i1[k] + jnp.sqrt(v) * (signs[k] * dw))
            new_i2.append(i2[k] + v)
        ys = tuple(cdg_ref[1, j] * ys[j] + cdg_ref[2, j] * dw
                   for j in range(n_factors))
        return ys, tuple(new_i1), tuple(new_i2)

    zeros = jnp.zeros(shape, jnp.float32)
    init = ((zeros,) * n_factors, (zeros,) * nb, (zeros,) * nb)
    _, i1, i2 = jax.lax.fori_loop(0, num_steps, body, init)
    for k in range(nb):
        i1_ref[k][:] = i1[k]
        i2_ref[k][:] = i2[k] * dt


@functools.partial(
    jax.jit,
    static_argnames=("hurst", "num_paths", "num_steps", "antithetic",
                     "rows"),
)
def rbergomi_lift_integrals_pallas(
    eta,
    T,
    seed,
    c,
    d,
    g,
    tail,
    hurst: float,
    *,
    num_paths: int,
    num_steps: int,
    xi_t: Optional[Array] = None,
    xi_flat=0.04,
    antithetic: bool = True,
    rows: int = 16,
) -> Tuple[Array, Array]:
    """(I1, I2), each (n_branch, num_paths) — fused-kernel twin of
    `ops/rough.py:rbergomi_core_lifted` (which remains the differentiable
    scan path). `c/d/g/tail` come from `ops/rough.py:rbergomi_lift`;
    `hurst` must be the static float the tables were built with.

    `rows=32` measured fastest on v5e (7.5 G path-steps/s at 2^18 × 1024
    — 8× the exact-covariance sampler, 4.2× the scan lift): the ~26-array
    factor carry spills past the vreg file at the SVJ kernels' rows=256
    (6.1 G) and under-fills the VPU at rows=8 (5.0 G)."""
    dtype = jnp.float32
    n = num_steps
    T = jnp.asarray(T, dtype)
    dt = T / n
    eta = jnp.asarray(eta, dtype)
    # Left-point tables (t_0 row first), exactly as the scan twin builds.
    sqrt_tail_left = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.sqrt(jnp.asarray(tail, dtype))[:-1]])
    t_left = dt * jnp.arange(n, dtype=dtype)
    wick_left = jnp.where(t_left > 0.0, t_left, 1.0) ** jnp.float32(
        2.0 * float(hurst))
    wick_left = jnp.where(t_left > 0.0, wick_left, 0.0)
    xi_vec = (jnp.asarray(xi_flat, dtype) * jnp.ones((n,), dtype)
              if xi_t is None else jnp.asarray(xi_t, dtype))
    e_tab = jnp.log(xi_vec) - 0.5 * eta * eta * wick_left
    step_tab = jnp.stack([e_tab, sqrt_tail_left])            # (2, n)
    cdg = jnp.stack([jnp.asarray(c, dtype), jnp.asarray(d, dtype),
                     jnp.asarray(g, dtype)])                 # (3, m)
    p_vec = jnp.stack([eta, jnp.sqrt(dt), dt])

    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    padded = half_grid * block_paths

    kernel = functools.partial(
        _rbergomi_lift_kernel, num_steps=num_steps, rows=rows,
        n_factors=int(cdg.shape[1]), n_branch=n_branch,
    )
    out_shape = jax.ShapeDtypeStruct((half_grid * rows, LANES), jnp.float32)
    block_spec = pl.BlockSpec((rows, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(half_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [eta, sqrt_dt, dt]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (3, m) c/d/g
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (2, n) step tables
        ],
        out_specs=(block_spec,) * (2 * n_branch),
        out_shape=(out_shape,) * (2 * n_branch),
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), p_vec, cdg, step_tab)

    def take(arrs):
        return jnp.stack([a.reshape(padded)[:num_paths] for a in arrs])

    return take(outs[0:n_branch]), take(outs[n_branch:2 * n_branch])


def _rbergomi_lift_stats_kernel(seed_ref, p_ref, cdg_ref, step_ref,
                                *out_refs, num_steps: int, rows: int,
                                n_factors: int, n_branch: int):
    """Fused rBergomi-lift PATH-STATS kernel — the hardware twin of
    `ops/rough.py:rbergomi_path_stats_lifted` (same recursion, same
    left-point tables; statistically pinned on real TPU).

    Extends `_rbergomi_lift_kernel` with the spot leg the Romano-Touzi
    integrals never needed: an explicit orthogonal normal per step and a
    per-branch (log S, Σ S, max log S, min log S) carry. dz = ρ dW +
    √(1−ρ²) dW' is odd in the draws (both normals flip with the pair), so
    ONE dz base serves both branches like the factor scan does; only the
    per-branch exp(v)/exp(log S)/sqrt tail duplicates. Draw economy: the
    loop advances TWO steps per trip — 6 uniforms → 3 fully-used
    Box-Muller transforms (the SVJ kernels' pairing trick).

    p_ref = [eta, sqrt_dt, dt, rho, orth, mu_dt]; cdg/step tables as in
    `_rbergomi_lift_kernel`. Outputs per branch: terminal/mean/max/min of
    S/S0 over t_1..t_n — the caller scales by spot (max/min commute with
    the monotone spot·exp(·))."""
    nb = n_branch
    term_ref = out_refs[0:nb]
    mean_ref = out_refs[nb:2 * nb]
    max_ref = out_refs[2 * nb:3 * nb]
    min_ref = out_refs[3 * nb:4 * nb]
    signs = (1.0, -1.0)[:nb]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    shape = (rows, LANES)
    eta = p_ref[0]
    sqrt_dt = p_ref[1]
    dt = p_ref[2]
    rho = p_ref[3]
    orth = p_ref[4]
    mu_dt = p_ref[5]

    def one_step(i, carry, z_dw, z_zeta, z_perp):
        ys, log_s, sum_s, max_ls, min_ls = carry
        w = step_ref[1, i] * z_zeta
        for j in range(n_factors):
            w = w + cdg_ref[0, j] * ys[j]
        ew = eta * w                   # odd in the draws: flips per branch
        e_i = step_ref[0, i]
        dw = z_dw * sqrt_dt
        dz = (rho * z_dw + orth * z_perp) * sqrt_dt   # odd too
        new_ls, new_sum, new_max, new_min = [], [], [], []
        for k in range(nb):
            v = jnp.exp(signs[k] * ew + e_i)
            ls = (log_s[k] + (mu_dt - 0.5 * v * dt)
                  + jnp.sqrt(v) * (signs[k] * dz))
            new_ls.append(ls)
            new_sum.append(sum_s[k] + jnp.exp(ls))
            new_max.append(jnp.maximum(max_ls[k], ls))
            new_min.append(jnp.minimum(min_ls[k], ls))
        ys = tuple(cdg_ref[1, j] * ys[j] + cdg_ref[2, j] * dw
                   for j in range(n_factors))
        return (ys, tuple(new_ls), tuple(new_sum), tuple(new_max),
                tuple(new_min))

    def body(it, carry):
        bits = pltpu.prng_random_bits((6, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(6)]
        z_a, z_b = _boxmuller(u[0], u[1])
        z_c, z_d = _boxmuller(u[2], u[3])
        z_e, z_f = _boxmuller(u[4], u[5])
        carry = one_step(2 * it, carry, z_a, z_b, z_c)
        carry = one_step(2 * it + 1, carry, z_d, z_e, z_f)
        return carry

    zeros = jnp.zeros(shape, jnp.float32)
    init = ((zeros,) * n_factors, (zeros,) * nb, (zeros,) * nb,
            (jnp.full(shape, -jnp.inf, jnp.float32),) * nb,
            (jnp.full(shape, jnp.inf, jnp.float32),) * nb)
    carry = jax.lax.fori_loop(0, num_steps // 2, body, init)
    if num_steps % 2 == 1:  # static tail step
        bits = pltpu.prng_random_bits((4, rows, LANES))
        u = [_bits_to_uniform(bits[i]) for i in range(4)]
        z_a, z_b = _boxmuller(u[0], u[1])
        z_c, _ = _boxmuller(u[2], u[3])
        carry = one_step(num_steps - 1, carry, z_a, z_b, z_c)

    _, log_s, sum_s, max_ls, min_ls = carry
    inv_n = jnp.float32(1.0 / num_steps)
    for k in range(nb):
        term_ref[k][:] = jnp.exp(log_s[k])
        mean_ref[k][:] = sum_s[k] * inv_n
        max_ref[k][:] = jnp.exp(max_ls[k])
        min_ref[k][:] = jnp.exp(min_ls[k])


@functools.partial(
    jax.jit,
    static_argnames=("hurst", "num_paths", "num_steps", "antithetic",
                     "rows"),
)
def rbergomi_lift_stats_pallas(
    params_vec,
    T,
    seed,
    c,
    d,
    g,
    tail,
    hurst: float,
    *,
    num_paths: int,
    num_steps: int,
    xi_t: Optional[Array] = None,
    antithetic: bool = True,
    rows: int = 16,
) -> dict:
    """Dict of (n_branch, num_paths) path statistics (s_terminal, s_mean,
    s_max, s_min over t_1..t_n) — fused-kernel twin of
    `ops/rough.py:rbergomi_path_stats_lifted` (the differentiable scan
    path). `params_vec` = (eta, rho, r, q, xi, spot) floats; `c/d/g/tail`
    from `ops/rough.py:rbergomi_lift`; `hurst` static as the tables'."""
    eta, rho_v, r_v, q_v, xi_flat, spot = params_vec
    dtype = jnp.float32
    n = num_steps
    T = jnp.asarray(T, dtype)
    dt = T / n
    eta = jnp.asarray(eta, dtype)
    rho_v = jnp.asarray(rho_v, dtype)
    sqrt_tail_left = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.sqrt(jnp.asarray(tail, dtype))[:-1]])
    t_left = dt * jnp.arange(n, dtype=dtype)
    wick_left = jnp.where(t_left > 0.0, t_left, 1.0) ** jnp.float32(
        2.0 * float(hurst))
    wick_left = jnp.where(t_left > 0.0, wick_left, 0.0)
    xi_vec = (jnp.asarray(xi_flat, dtype) * jnp.ones((n,), dtype)
              if xi_t is None else jnp.asarray(xi_t, dtype))
    e_tab = jnp.log(xi_vec) - 0.5 * eta * eta * wick_left
    step_tab = jnp.stack([e_tab, sqrt_tail_left])            # (2, n)
    cdg = jnp.stack([jnp.asarray(c, dtype), jnp.asarray(d, dtype),
                     jnp.asarray(g, dtype)])                 # (3, m)
    orth = jnp.sqrt(jnp.maximum(1.0 - rho_v * rho_v, 0.0))
    mu_dt = (jnp.asarray(r_v, dtype) - jnp.asarray(q_v, dtype)) * dt
    p_vec = jnp.stack([eta, jnp.sqrt(dt), dt, rho_v, orth, mu_dt])

    block_paths = rows * LANES
    half_grid = max(1, -(-num_paths // block_paths))
    n_branch = 2 if antithetic else 1
    padded = half_grid * block_paths

    kernel = functools.partial(
        _rbergomi_lift_stats_kernel, num_steps=num_steps, rows=rows,
        n_factors=int(cdg.shape[1]), n_branch=n_branch,
    )
    out_shape = jax.ShapeDtypeStruct((half_grid * rows, LANES), jnp.float32)
    block_spec = pl.BlockSpec((rows, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(half_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # p_vec
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (3, m) c/d/g
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (2, n) step tables
        ],
        out_specs=(block_spec,) * (4 * n_branch),
        out_shape=(out_shape,) * (4 * n_branch),
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), p_vec, cdg, step_tab)

    spot = jnp.asarray(spot, dtype)

    def take(arrs):
        return spot * jnp.stack(
            [a.reshape(padded)[:num_paths] for a in arrs])

    return {
        "s_terminal": take(outs[0:n_branch]),
        "s_mean": take(outs[n_branch:2 * n_branch]),
        "s_max": take(outs[2 * n_branch:3 * n_branch]),
        "s_min": take(outs[3 * n_branch:4 * n_branch]),
    }
