"""Scaling curve for the sharded MC programs over a growing device mesh.

VERDICT r4 item 6: MULTICHIP_r*.json proves the sharded programs are
*correct*; nothing showed how they *scale*. This harness sweeps the mesh
1 → 2 → 4 → 8 devices on a FIXED global workload (strong scaling of one
desk-size batch) and reports time + parallel efficiency per width.

Each width runs in its own subprocess because the device count is fixed
at backend init (`xla_force_host_platform_device_count`). On the CPU
host the virtual devices share one physical core, so wall-time staying
FLAT as the mesh widens is the pass signal — it means the psum'd moment
pooling adds no per-device overhead and per-device work shrinks 1/n (the
collectives are O(strikes) floats, invisible next to the path math). On
real multi-chip hardware the same programs turn that flat curve into a
1/n wall-time curve; the single real TPU chip anchors absolute
throughput separately (bench.py / BENCH_r*.json).

Usage: python benchmarks/weak_scaling.py [--quick] [--out FILE]
Writes one JSON document (also printed to stdout).

Reference: nothing — the reference's one parallelism axis is numba
prange threads (monte_carlo.py:189); this axis is the rebuild's own
(SURVEY.md §5.8).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
import jax
# The axon TPU plugin overrides JAX_PLATFORMS=cpu from the environment —
# forcing the virtual CPU mesh needs the config call before backend init
# (the tests/conftest.py discipline; without it the child sees the one
# real TPU chip and the device-count assert below fires).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

n_dev = int(sys.argv[1])
num_paths = int(sys.argv[2])
num_steps = int(sys.argv[3])
trials = int(sys.argv[4])

from mcos_tpu.models.params import SVJParams
from mcos_tpu.parallel.mesh import make_mesh, sharded_price

mesh = make_mesh()
assert len(jax.devices()) == n_dev, (n_dev, jax.devices())
params = SVJParams()
strikes = jnp.asarray([21500.0, 22500.0, 23500.0], jnp.float32)

def run(seed):
    return sharded_price(params, 22500.0, strikes, 0.25,
                         jax.random.key(seed), mesh=mesh,
                         num_paths=num_paths, num_steps=num_steps)

r = jax.device_get(run(0))                       # compile + warm
best = float("inf")
for t in range(trials):
    t0 = time.perf_counter()
    out = run(t + 1)
    jax.block_until_ready(out["price"])
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"n_devices": n_dev, "seconds": best,
                  "price": float(r["price"][1]),
                  "paths_per_sec": 2 * num_paths / best}))
"""


def measure(widths, num_paths, num_steps, trials):
    rows = []
    for n in widths:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n} "
            + env.get("XLA_FLAGS", "").replace(
                "--xla_force_host_platform_device_count=8", ""))
        out = subprocess.run(
            [sys.executable, "-c", _CHILD,
             str(n), str(num_paths), str(num_steps), str(trials)],
            capture_output=True, text=True, env=env, timeout=1800)
        if out.returncode != 0:
            raise RuntimeError(f"width {n} failed:\n{out.stderr[-2000:]}")
        rows.append(json.loads(out.stdout.strip().splitlines()[-1]))
    t1 = rows[0]["seconds"]
    for r in rows:
        # Serial CPU host: ideal strong scaling is FLAT wall time (work
        # conserved); efficiency = t_1 / t_n. On real chips the same
        # number divided by n_devices becomes per-chip efficiency.
        r["efficiency_vs_1dev"] = round(t1 / r["seconds"], 3)
        r["seconds"] = round(r["seconds"], 3)
        r["paths_per_sec"] = round(r["paths_per_sec"])
        r["price"] = round(r["price"], 4)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    num_paths = 1 << 18 if args.quick else 1 << 21
    num_steps = 32 if args.quick else 64
    doc = {
        "workload": f"sharded_price SVJ, {num_paths} global paths x 2 "
                    f"branches x {num_steps} steps x 3 strikes, fixed "
                    "while the mesh widens (strong scaling)",
        "host": "cpu-virtual (one physical core; flat time = pass)",
        "rows": measure((1, 2, 4, 8), num_paths, num_steps,
                        2 if args.quick else 3),
    }
    text = json.dumps(doc, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
