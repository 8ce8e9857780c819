/* mcos_tpu desk — offline Monte Carlo engine (client-side fallback).
 *
 * Role of the reference's Gen-1 browser engine (js/engine.js:42-95 GBM MC,
 * :195-214 client-computed convergence), rebuilt from scratch: when the API
 * is unreachable the desk still simulates, prices, and shows a REAL
 * convergence series locally. GBM at σ = √v0 (the Gen-1 engine is
 * constant-vol too); antithetic pairing; deterministic seeded RNG so reruns
 * reproduce.
 */
"use strict";

const localMC = {
  /* mulberry32 — tiny deterministic PRNG, plenty for a viz fallback. */
  rng(seed) {
    let a = seed >>> 0;
    return () => {
      a = (a + 0x6D2B79F5) | 0;
      let t = Math.imul(a ^ (a >>> 15), 1 | a);
      t = (t + Math.imul(t ^ (t >>> 7), 61 | t)) ^ t;
      return (((t ^ (t >>> 14)) >>> 0) + 0.5) / 4294967296;
    };
  },

  /* Simulate GBM terminals + a few recorded paths.
   * Returns { terminals, paths } — terminals length 2·numPairs via
   * antithetic mirroring, paths = first `record` full trajectories. */
  simulate(spot, sigma, r, q, T, numPairs, steps, seed = 42, record = 40) {
    const rand = this.rng(seed);
    const dt = T / steps;
    const drift = (r - q - 0.5 * sigma * sigma) * dt;
    const vol = sigma * Math.sqrt(dt);
    const terminals = new Float64Array(2 * numPairs);
    const paths = [];
    for (let i = 0; i < numPairs; i++) {
      let logA = Math.log(spot), logB = logA;
      const rec = i < record ? [spot] : null;
      for (let t = 0; t < steps; t++) {
        // Box-Muller (one normal per step keeps the loop branch-free).
        const z = Math.sqrt(-2 * Math.log(rand())) *
                  Math.cos(2 * Math.PI * rand());
        logA += drift + vol * z;
        logB += drift - vol * z;           // antithetic twin
        if (rec) rec.push(Math.exp(logA));
      }
      terminals[2 * i] = Math.exp(logA);
      terminals[2 * i + 1] = Math.exp(logB);
      if (rec) paths.push(rec);
    }
    return { terminals, paths };
  },

  /* Price a European option off simulated terminals. */
  price(spot, strike, T, r, q, sigma, isCall, numPairs = 5000, steps = 64,
        seed = 42) {
    const { terminals, paths } = this.simulate(
      spot, sigma, r, q, T, numPairs, steps, seed);
    const disc = Math.exp(-r * T);
    // Antithetic-combined per-pair payoffs (matches the server estimator).
    const pay = new Float64Array(numPairs);
    for (let i = 0; i < numPairs; i++) {
      const a = isCall ? Math.max(terminals[2 * i] - strike, 0)
                       : Math.max(strike - terminals[2 * i], 0);
      const b = isCall ? Math.max(terminals[2 * i + 1] - strike, 0)
                       : Math.max(strike - terminals[2 * i + 1], 0);
      pay[i] = 0.5 * (a + b);
    }
    let sum = 0, sumSq = 0;
    for (const v of pay) { sum += v; sumSq += v * v; }
    const mean = sum / numPairs;
    const varr = Math.max(sumSq / numPairs - mean * mean, 0);
    return {
      price: disc * mean,
      std_error: disc * Math.sqrt(varr / numPairs),
      pay, disc, terminals, sample_paths: paths,
    };
  },

  /* True prefix-mean convergence series (role of js/engine.js:195-214 —
   * which the reference Gen-2 UI replaced with a FAKED chart). */
  convergence(pay, disc, checkpoints = 12) {
    const n = pay.length;
    const counts = [];
    for (let k = 0; k < checkpoints; k++) {
      const c = Math.round(Math.max(n / 2 ** (checkpoints - 1 - k), 32));
      if (!counts.length || c > counts[counts.length - 1]) counts.push(c);
    }
    let sum = 0, sumSq = 0, idx = 0;
    const out = { num_paths: [], price: [], std_error: [] };
    counts.forEach((c) => {
      for (; idx < c; idx++) { sum += pay[idx]; sumSq += pay[idx] * pay[idx]; }
      const mean = sum / c;
      const varr = Math.max(sumSq / c - mean * mean, 0);
      out.num_paths.push(c);
      out.price.push(disc * mean);
      out.std_error.push(disc * Math.sqrt(varr / c));
    });
    return out;
  },
};

/* Closed-form BS Greeks for the offline panel (npdf + localBS.ncdf). */
const localBSGreeks = (S, K, T, r, q, sigma, isCall) => {
  const st = sigma * Math.sqrt(T);
  const d1 = (Math.log(S / K) + (r - q + sigma * sigma / 2) * T) / st;
  const d2 = d1 - st;
  const npdf = (x) => Math.exp(-x * x / 2) / Math.sqrt(2 * Math.PI);
  const dfq = Math.exp(-q * T), dfr = Math.exp(-r * T);
  const N = localBS.ncdf.bind(localBS);
  const delta = isCall ? dfq * N(d1) : dfq * (N(d1) - 1);
  const thetaAnnual =
    -S * dfq * npdf(d1) * sigma / (2 * Math.sqrt(T))
    - (isCall ? 1 : -1) * (r * K * dfr * N(isCall ? d2 : -d2)
                           - q * S * dfq * N(isCall ? d1 : -d1));
  return {
    delta: { pathwise: delta, finite_diff: delta, diff_pct: 0 },
    gamma: { gamma: dfq * npdf(d1) / (S * st) },
    vega: { vega_per_vol_point: S * dfq * npdf(d1) * Math.sqrt(T) },
    // Server convention: theta_daily holds the annualized decay rate
    // (documented reference quirk, engine/greeks.py).
    theta: { theta_daily: thetaAnnual, theta_annual: thetaAnnual * 252 },
    rho: { rho: (isCall ? 1 : -1) * K * T * dfr * N(isCall ? d2 : -d2) },
    jumps: { lambda_j: NaN },
  };
};
