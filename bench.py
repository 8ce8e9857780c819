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

    # Throughput: sustained rate over a production-scale batch. A single
    # dispatch carries a fixed ~28 ms host→device round-trip (the axon
    # tunnel), so a one-call timing under-reports the chip by ~4×; chaining
    # kernel invocations inside one jit amortizes it the same way a real
    # serving batch does. Workload: 4 chained calls × 2^22 paths/branch ×
    # 2 antithetic branches × 1024 steps ≈ 3.4e10 path-steps per timing.
    num_paths, num_steps, chain = 1 << 22, 1024, 4
    total_path_steps = chain * 2 * num_paths * num_steps

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def sustained(seed0, _tag):
        acc = jnp.float32(0.0)
        for i in range(chain):
            s = gbm_terminal_pallas(spot, sigma, r, q, T, seed0 + i,
                                    num_paths=num_paths, num_steps=num_steps)
            acc = acc + jnp.sum(jnp.maximum(s - strike, 0.0))
        return acc

    float(sustained(0, 0))  # warmup/compile
    times = []
    for trial in range(3):
        t0 = time.perf_counter()
        float(sustained(100 * (trial + 1), 0))  # scalar fetch = full sync
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
