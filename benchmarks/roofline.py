"""Empirical VPU roofline for the Pallas path-simulation kernels.

VERDICT r3 item 5: "55.6x the north-star" says nothing about how much
headroom is left. This harness answers that with an *empirical* roofline:

1. Microbenchmark the per-element throughput of every VPU op class the
   kernels spend time in (exp, log, sqrt, sin+cos, divide, FMA chain,
   hardware-PRNG draw + uniform conversion, Acklam ndtri) using Pallas
   kernels whose block stays resident in vregs — the same regime the
   simulation kernels run in (no HBM traffic inside the step loop).
2. Combine the measured throughputs with a hand-audited per-path-step op
   count for each simulation kernel (counts documented in KERNEL_OPS
   below, cross-referenced to the kernel sources).
3. Modeled path-steps/s = 1 / sum_i(count_i / throughput_i) — the
   serial-issue VPU model: every op class occupies the vector unit, so
   this is the rate with zero cross-class overlap. The real kernels
   overlap op classes beyond what the microbench can express and beat
   this model (GBM by ~1.6×), so the model is a LOWER bound, not a
   ceiling. The committed table therefore anchors "attainable" on the
   family's demonstrated ceiling (see `anchored`): the best
   measured/modeled ratio in the family rescales every kernel's model,
   and `pct_of_attainable` reads as "how well does this kernel overlap
   its op mix relative to the best-mapped kernel" — 100% = no
   implementation headroom left relative to anything this repo has
   demonstrated on this chip.

Run on real TPU: python benchmarks/roofline.py [--measured RESULTS.json]
Prints one JSON document; docs/BENCHMARKS.md carries the narrated table.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128
ROWS = 256
GRID = 64
ITERS = 256         # fori_loop trips; evals = CHAINS * unroll * ITERS / elt


def _ops():
    """Bounded self-maps so a repeated application can't overflow/denormal
    and the compiler can't fold the chain (each output feeds the next)."""
    import jax
    import jax.numpy as jnp
    from mcos_tpu.ops.pallas_kernels import (_bits_to_uniform, _ndtri_kernel,
                                             _sincos_2pi)
    from jax.experimental.pallas import tpu as pltpu

    def sincos_poly(x):
        # the kernels' quadrant-folded Box-Muller trig; keep output in a
        # bounded interval so repeated application stays well-conditioned
        s, c = _sincos_2pi(jnp.clip(x, 0.0, 1.0))
        return 0.37 * (s + c) + 0.5

    def rand(x):
        bits = pltpu.prng_random_bits((ROWS, LANES))
        # one draw block + one uniform conversion, accumulated (bounded
        # growth: +~0.5/eval, ~1e5 evals max -> fine in f32)
        return x + _bits_to_uniform(bits)

    return {
        # x in (0,1] -> exp(-x) in [0.37,1): contraction toward 0.567
        "exp": lambda x: jnp.exp(-x),
        # fixed point of log(x)+1.5 is ~2.36; stays in [1,3]
        "log": lambda x: jnp.log(x) + 1.5,
        # fixed point of sqrt(x)+0.25 is ~1.57
        "sqrt": lambda x: jnp.sqrt(x) + 0.25,
        # libm pair (what Box-Muller USED to issue — kept for the table)
        "sincos": lambda x: jnp.cos(x) + jnp.sin(x),
        # the kernels' actual trig since the poly rewrite
        "sincos_poly": sincos_poly,
        "div": lambda x: 1.0 / (x + 1.5),
        # one multiply-add; fixed point 1.0
        "fma": lambda x: x * 0.999 + 0.001,
        "rand_uniform": rand,
        # keep the argument strictly inside (0,1); |ndtri| <= 2.06 here
        "ndtri": lambda x: _ndtri_kernel(jnp.clip(
            x * jnp.float32(0.21) + 0.5, 0.02, 0.98)),
    }


CHAINS = 8          # independent dependence chains (hide op latency)
UNROLL_LO, UNROLL_HI = 4, 16   # two depths; the SLOPE is the per-op cost


def measure_op_throughputs(trials=3, chains=None):
    """Pipelined per-element op throughput, by differential timing.

    A single dependent chain measures op LATENCY, and a fixed unroll
    inside a fori_loop bills the loop bookkeeping to the op — both made
    the first-cut numbers ~4x too low (the simulation kernels measurably
    beat that \"attainable\", which is how the bug was caught). Here each
    loop trip advances CHAINS independent carries (ILP the VPU can
    pipeline, like the kernels' per-branch state updates), and the per-op
    cost is the (t_hi − t_lo) / (evals_hi − evals_lo) slope between two
    unroll depths — loop overhead and dispatch cancel exactly.

    CHAINS calibration (round 5): at CHAINS=4 the fma row measured
    1.40 T/s vs the v5e VPU's ~4 T/s issue peak and the GBM kernel beat
    its own \"attainable\" by 1.57x — four carries still leave pipeline
    bubbles. CHAINS=8 saturates (doubling again to 16 moves the rows
    <5%); the committed table uses 8.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chains = CHAINS if chains is None else chains

    def build(fn, name, unroll):
        def kernel(x_ref, o_ref):
            if name == "rand_uniform":
                pltpu.prng_seed(12345, pl.program_id(0))
            xs = tuple(x_ref[:] + jnp.float32(0.01) * k
                       for k in range(chains))

            def body(_, xs):
                for _u in range(unroll):
                    xs = tuple(fn(x) for x in xs)
                return xs
            xs = jax.lax.fori_loop(0, ITERS, body, xs)
            acc = xs[0]
            for x in xs[1:]:
                acc = acc + x
            o_ref[:] = acc

        spec = pl.BlockSpec((ROWS, LANES), lambda b: (b, 0))
        run = pl.pallas_call(
            kernel, grid=(GRID,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES),
                                           jnp.float32))
        # Scalar-fetch sync: the axon tunnel's block_until_ready returns
        # before execution completes (see benchmarks/suite.py:timed).
        return jax.jit(lambda x: jnp.float32(run(x).sum()))

    results = {}
    x0 = jnp.full((GRID * ROWS, LANES), 0.6, jnp.float32)
    for name, fn in _ops().items():
        best = {}
        for unroll in (UNROLL_LO, UNROLL_HI):
            total = build(fn, name, unroll)
            jax.device_get(total(x0))             # compile
            b = np.inf
            for _ in range(trials):
                t0 = time.perf_counter()
                jax.device_get(total(x0))
                b = min(b, time.perf_counter() - t0)
            best[unroll] = b
        d_evals = (GRID * ROWS * LANES * chains * ITERS
                   * (UNROLL_HI - UNROLL_LO))
        dt = max(best[UNROLL_HI] - best[UNROLL_LO], 1e-9)
        results[name] = d_evals / dt
    return results


# Hand-audited per-OUTPUT-path-step op counts (ops/pallas_kernels.py).
# "Output path-step" = one path advanced one step on one antithetic branch;
# kernels that fuse the antithetic pair into one block (QE) or share a
# Box-Muller pair across two steps are already divided through.
KERNEL_OPS = {
    # NOTE on trig: the kernels' Box-Muller no longer calls libm sin/cos —
    # `_sincos_2pi` (pallas_kernels.py) computes the pair with quadrant
    # folding + minimax polys, ~20 FMA-class ops per (sin, cos) pair
    # (measured 10 ps/pair vs libm's 27.5 ps). Each former `sincos` count
    # therefore appears below as count x 20 extra "fma".
    #
    # _gbm_kernel (pair-fused): per 2 steps per PAIR (4 output path-steps):
    # 1 draw block (2 subblocks -> 2 u2f), 1 BM (log + sqrt + poly pair);
    # cheap ops per trip: 2 muls (scaled z, shared) + 2 branches x 2 steps
    # x ~2 (drift add + signed FMA) = ~10 -> 2.5, + 0.25 x 20 poly = 7.5.
    "gbm": {"rand_uniform": 0.5, "log": 0.25, "sqrt": 0.25, "fma": 7.5},
    # _svj_kernel (pair-fused, companion on; round-5 Binomial-count jump
    # draw): per 2 steps per PAIR (4 output path-steps): 4 draws, 2 BM —
    # the per-step jump uniforms are gone (ONE end-of-path uniform
    # inverts the packed count CDF, ~128 ops amortized over num_steps);
    # per output step: 1 sqrt(v) per branch + shared dW1/dW2 (~2) +
    # per-branch drift/var updates in hoisted-coefficient form (~9) +
    # CV carry (~1) = ~12 cheap + 0.5 x 20 poly = 22.
    "svj_euler": {"rand_uniform": 1.0, "log": 0.5, "sqrt": 1.5,
                  "fma": 22.0},
    # _svj_td_kernel: same vector op mix as svj_euler — the per-step
    # (θ,ξ,λ) SMEM table reads are scalar-side noise (measured overhead
    # 5.6%, RESULTS config11).
    "svj_td": {"rand_uniform": 1.0, "log": 0.5, "sqrt": 1.5, "fma": 22.0},
    # _hhw_kernel (pair-fused): per 2 steps per PAIR: 6 draws, 3 BM
    # (no uniforms kept); per output step: 1 sqrt(v) per branch + shared
    # Cholesky mixes zv/zr (~2.5) + per-branch spot/var/rate/integral
    # updates (~17.5) = ~20 cheap + 0.75 x 20 poly = 35.
    "hhw": {"rand_uniform": 1.5, "log": 0.75, "sqrt": 1.75, "fma": 35.0},
    # _svj_qe_kernel (pair-fused, companion on; round-5 Binomial-count
    # jump draw): per step per PAIR: 3 draws (was 4 — the per-step jump
    # uniform is gone), 1 BM, variance: 2 sqrt + 1 log + 5 div (t, a,
    # p_mass, and 2 in the exponential inverse — recounted round 5),
    # vol sqrt, ~20 cheap shared + 2x4 per-branch updates; /2 branches,
    # + 0.5 x 20 poly.
    "svj_qe": {"rand_uniform": 1.5, "log": 1.0, "sqrt": 2.0,
               "div": 2.5, "fma": 24.0},
    # _rbergomi_lift_kernel (m=24 factors, pair-fused via state linearity):
    # per step per PAIR: 1 draw block (2 subblocks -> 2 u2f), 1 BM, ONE
    # factor scan (3m = 72 FMA), then per branch 1 exp + 1 sqrt + ~5 misc.
    # Per output path-step: 36 + ~6 FMA + 0.25 x 20 poly, 1 exp, 1 sqrt(v).
    "rbergomi_lift_m24": {"rand_uniform": 0.5, "exp": 1.0, "log": 0.25,
                          "sqrt": 1.25, "fma": 47.0},
}


def attainable(tputs):
    out = {}
    for kname, counts in KERNEL_OPS.items():
        t_per_step = 0.0
        for op, cnt in counts.items():
            t_per_step += cnt / tputs[op]
        out[kname] = 1.0 / t_per_step
    return out


def anchored(att, meas):
    """Family-ceiling-anchored attainable (round 5).

    The serial-issue microbench model is a LOWER bound on the hardware:
    the real kernels overlap op classes (PRNG draws against FMAs, the
    per-branch state updates against each other) far beyond the
    8-chain ILP the microbench can express, and every committed kernel
    measurably beats its modeled "attainable" (GBM by ~1.6×). A table
    where measured > 100% of attainable answers nothing. So the
    headroom question is re-anchored on the family's own demonstrated
    ceiling: beat = max_k measured_k / modeled_k is how far past the
    serial-issue model THIS hardware demonstrably goes; a kernel's
    anchored attainable is modeled_k × beat, i.e. "what this kernel
    would sustain if it overlapped its op mix as well as the
    best-mapped kernel in the family does". The best kernel sits at
    100% by construction; the gap below 100% for the others is
    implementation headroom (stalls, spills, un-overlapped op classes),
    not op-mix physics — the op mix is already priced into modeled_k.
    """
    beats = {k: meas[k] / att[k] for k in meas if k in att}
    if not beats:
        return {}, None, {}
    best = max(beats, key=beats.get)
    beat = beats[best]
    anc = {k: att[k] * beat for k in meas if k in att}
    pct = {k: 100.0 * meas[k] / anc[k] for k in anc}
    return anc, {"kernel": best, "beat_factor": beat}, pct


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", default=None,
                    help="RESULTS_*.json to pull measured path-steps/s from")
    ap.add_argument("--chains", type=int, default=CHAINS,
                    help="independent dependence chains (ILP) in the "
                         "microbench; see measure_op_throughputs")
    args = ap.parse_args()

    import jax
    backend = jax.default_backend()
    if backend != "tpu":
        raise SystemExit("roofline.py measures the hardware VPU — run on "
                         "real TPU (the interpreter has no PRNG and no "
                         "meaningful op timings).")
    tputs = measure_op_throughputs(chains=args.chains)
    att = attainable(tputs)

    report = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "block": {"rows": ROWS, "lanes": LANES, "grid": GRID,
                  "chains": args.chains, "iters": ITERS,
                  "unroll_depths": [UNROLL_LO, UNROLL_HI],
                  "method": "differential slope between unroll depths"},
        "op_throughput_per_sec": tputs,
        "kernel_ops_per_path_step": KERNEL_OPS,
        "attainable_path_steps_per_sec": att,
    }

    if args.measured and os.path.exists(args.measured):
        with open(args.measured) as fh:
            res = json.load(fh)
        meas = {}
        c8 = res.get("config8_sustained", {})
        for key, kname in [("gbm_path_steps_per_sec", "gbm"),
                           ("svj_path_steps_per_sec", "svj_euler"),
                           ("qe_path_steps_per_sec", "svj_qe"),
                           ("hhw_path_steps_per_sec", "hhw")]:
            if key in c8:
                meas[kname] = c8[key]
        c11 = res.get("config11_td_svj", {})
        if "td_path_steps_per_sec" in c11:
            meas["svj_td"] = c11["td_path_steps_per_sec"]
        c10 = res.get("config10_rough_scaling", {})
        row = c10.get("sustained_1024", {})
        if "lift_pallas_path_steps_per_sec" in row:
            meas["rbergomi_lift_m24"] = row["lift_pallas_path_steps_per_sec"]
        else:  # pre-round-4 RESULTS files: single-call ladder row only
            row = c10.get("steps_1024", {})
            if "lift_pallas_paths_per_sec" in row:
                meas["rbergomi_lift_m24"] = (row["lift_pallas_paths_per_sec"]
                                             * 1024)
        report["measured_path_steps_per_sec"] = meas
        report["pct_of_serial_issue_model"] = {
            k: 100.0 * v / att[k] for k, v in meas.items() if k in att}
        anc, anchor, pct = anchored(att, meas)
        report["anchor"] = anchor
        report["attainable_anchored"] = anc
        report["pct_of_attainable"] = pct

    print(json.dumps(report, indent=2, default=float))


if __name__ == "__main__":
    main()
