"""Headline benchmark: GBM path-steps/sec/chip via the fused Pallas kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is the ratio against the 1e9 path-steps/sec/chip north star
(BASELINE.md; the reference publishes no numbers of its own).

The run also gates on correctness: the kernel's MC price must land within
3σ of the Black-Scholes analytic on the PR1 European-call workload
(50k paths × 250 steps) or the benchmark reports value 0.
"""

import json
import time

import numpy as np


TARGET = 1e9  # path-steps/sec/chip (BASELINE.md north star)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mcos_tpu.ops.bs import bs_price
    from mcos_tpu.ops.pallas_kernels import gbm_terminal_pallas

    spot, strike, sigma, r, q, T = 22500.0, 22500.0, 0.2, 0.065, 0.012, 1.0

    # Correctness gate: PR1 workload (50k paths × 250 steps), MC within 3σ.
    s = gbm_terminal_pallas(spot, sigma, r, q, T, 7,
                            num_paths=25_000, num_steps=250, antithetic=True)
    pay = jnp.maximum(s - strike, 0.0).mean(axis=0)  # antithetic-combined
    disc = float(np.exp(-r * T))
    mc = disc * float(pay.mean())
    se = disc * float(pay.std()) / np.sqrt(pay.shape[0])
    ref = float(bs_price(spot, strike, T, r, q, sigma, True))
    accurate = abs(mc - ref) < 3.0 * se

    # Throughput: 2^20 paths/branch × 2 branches × 256 steps per call.
    num_paths, num_steps = 1 << 20, 256
    total_path_steps = 2 * num_paths * num_steps

    gbm_terminal_pallas(spot, sigma, r, q, T, 0,
                        num_paths=num_paths, num_steps=num_steps
                        ).block_until_ready()  # warmup/compile
    times = []
    for trial in range(5):
        t0 = time.perf_counter()
        out = gbm_terminal_pallas(spot, sigma, r, q, T, trial + 1,
                                  num_paths=num_paths, num_steps=num_steps)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    throughput = total_path_steps / min(times)
    value = throughput if accurate else 0.0
    print(json.dumps({
        "metric": "gbm_path_steps_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "path-steps/s",
        "vs_baseline": round(value / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
