"""Scrambled Sobol QMC + Brownian-bridge construction, TPU-resident.

TPU-native re-design of the reference's QMC pipeline
(reference: engine/monte_carlo.py:61-183).

Differences from the reference — all deliberate:

- **Points are generated on device.** The reference materializes Sobol
  uniforms on the host with scipy (monte_carlo.py:78-79). Here only the Sobol
  *direction numbers* (dims × 30 uint32, a few KB) come from scipy's tables;
  the gray-code XOR expansion, digital-shift scrambling, uniform conversion and
  inverse-CDF all run inside one jit on the TPU.
- **Digital-shift scrambling** replaces scipy's Owen/LMS scrambling: each
  dimension is XORed with an independent random 30-bit shift. This preserves
  the (t, m, s)-net equidistribution and randomizes the origin; Owen scrambling
  is stronger in theory but sequential in construction and host-bound.
- **The Brownian bridge is a precomputed matrix**, so path construction is a
  single (paths × steps) @ (steps × steps) matmul on the MXU instead of the
  reference's per-dimension Python loop (monte_carlo.py:115-145).
- **Bug fixed:** the reference's endpoint search (`_find_bridge_endpoints`,
  monte_carlo.py:172-183) initializes the right bracket at the terminal index
  with W(T) treated as a known zero, which gives the first placed point —
  the terminal point itself — *zero* conditional variance. Its "Brownian
  motion" is therefore a bridge pinned to W(T)=0 (total terminal variance 0),
  silently masked by the BS control variate. Here the first Sobol dimension
  drives W(T) = √T·Z₀ as the construction requires.

As in the reference, path counts are rounded up to the next power of two for
sampling balance and truncated back (monte_carlo.py:74-85).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri

Array = jax.Array

_SOBOL_BITS = 30  # scipy's qmc.Sobol uses 30-bit integers
_U32_SCALE = np.float32(2.0 ** -_SOBOL_BITS)
_CLIP = 1e-7  # f32-safe tail clip before ndtri (reference clips 1e-10 in f64)


@functools.lru_cache(maxsize=32)
def sobol_direction_numbers(dims: int) -> np.ndarray:
    """Joe-Kuo direction numbers, shape (dims, 30) uint32, from scipy's table."""
    from scipy.stats import qmc

    return np.array(qmc.Sobol(d=dims, scramble=False)._sv[:, :_SOBOL_BITS],
                    dtype=np.uint32)


# ─────────────────────────────────────────────────────────────────────────────
# Brownian-bridge construction matrix
# ─────────────────────────────────────────────────────────────────────────────
def bb_ordering(num_steps: int) -> np.ndarray:
    """Bisection order of time points for the bridge.

    Returns indices into the *cumulative* grid 1..num_steps (1-based point k is
    time k·dt). order[0] is the terminal point; subsequent entries bisect the
    intervals breadth-first so low Sobol dimensions carry coarse structure.
    """
    order = [num_steps]
    queue = [(0, num_steps)]
    while queue:
        lo, hi = queue.pop(0)
        if hi - lo <= 1:
            continue
        mid = (lo + hi) // 2
        order.append(mid)
        queue.append((lo, mid))
        queue.append((mid, hi))
    return np.asarray(order, np.int64)


@functools.lru_cache(maxsize=64)
def brownian_bridge_matrix(num_steps: int) -> np.ndarray:
    """Matrix M with dW = Z @ Mᵀ for unit-horizon Brownian increments.

    Z holds iid standard normals in bridge-construction order (Sobol dim k
    drives the k-th placed point); dW are the `num_steps` increments of a
    standard Brownian motion on [0, 1]. Scale by √T for horizon T.

    Built in float64 on the host once per step count (cached), cast to f32.
    """
    n = num_steps
    order = bb_ordering(n)
    # a[k] = coefficient vector of cumulative point k (0..n) over the Z dims.
    a = np.zeros((n + 1, n), dtype=np.float64)
    t = np.linspace(0.0, 1.0, n + 1)
    placed = [0]  # cumulative index 0 is pinned at W=0
    for dim, k in enumerate(order):
        left = max(p for p in placed if p < k)
        right_candidates = [p for p in placed if p > k]
        if right_candidates:
            right = min(right_candidates)
            w = (t[k] - t[left]) / (t[right] - t[left])
            var = (t[k] - t[left]) * (t[right] - t[k]) / (t[right] - t[left])
            a[k] = (1.0 - w) * a[left] + w * a[right]
        else:
            # Unconditioned segment end (the terminal point): W_k = W_left + √Δt·Z.
            var = t[k] - t[left]
            a[k] = a[left]
        a[k, dim] += np.sqrt(var)
        placed.append(k)
    # Increments: dW_i = W_{i+1} − W_i.
    m = a[1:] - a[:-1]
    return np.ascontiguousarray(m, dtype=np.float32)


# ─────────────────────────────────────────────────────────────────────────────
# Device-side point generation
# ─────────────────────────────────────────────────────────────────────────────
@partial(jax.jit, static_argnames=("num_points",))
def _sobol_uniforms(sv: Array, shift: Array, num_points: int) -> Array:
    """Sobol points via gray-code XOR expansion + digital-shift scramble.

    Args:
        sv: (dims, 30) uint32 direction numbers.
        shift: (dims,) uint32 30-bit digital shift.
    Returns:
        (num_points, dims) float32 uniforms in (0, 1).
    """
    dims = sv.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.uint32, (num_points, 1), 0)[:, 0]
    gray = idx ^ (idx >> 1)

    def body(b, acc):
        bit = ((gray >> b) & 1).astype(bool)
        return acc ^ jnp.where(bit[:, None], sv[None, :, b], jnp.uint32(0))

    acc = jnp.broadcast_to(shift[None, :], (num_points, dims))
    acc = jax.lax.fori_loop(0, _SOBOL_BITS, body, acc)
    # Center each 30-bit integer in its cell for an unbiased uniform.
    return (acc.astype(jnp.float32) + 0.5) * _U32_SCALE


def sobol_normals(num_paths: int, dims: int, seed: int = 0,
                  stream: int = 0) -> Array:
    """Scrambled-Sobol standard normals, shape (num_paths, dims).

    Mirrors generate_sobol_normals (monte_carlo.py:61-85): rounds the point
    count up to a power of two, inverse-CDF transforms, truncates to
    `num_paths`. `stream` decouples scrambles for independent blocks.
    """
    m = int(np.ceil(np.log2(max(num_paths, 2))))
    n_sobol = 2**m
    sv = jnp.asarray(sobol_direction_numbers(dims))
    key = jax.random.fold_in(jax.random.key(seed), stream)
    shift = jax.random.bits(key, (dims,), jnp.uint32) & jnp.uint32(2**_SOBOL_BITS - 1)
    u = _sobol_uniforms(sv, shift, n_sobol)
    u = jnp.clip(u, _CLIP, 1.0 - _CLIP)
    return ndtri(u)[:num_paths]


def sobol_svj_draws(num_paths: int, num_steps: int,
                    seed: int = 0) -> Tuple[Array, Array, Array, Array]:
    """Full SVJ draw set from one scrambled Sobol stream.

    Matches the reference's layout (monte_carlo.py:290-308): 3·steps Sobol
    dimensions split into Z1 | Z2 | Z_jump_size, Brownian-bridge reordering
    applied to Z1 and Z2, jump-occurrence uniforms from an independent PRNG
    stream (reference uses seed+1).

    Returns:
        (z1, z2, u_jump, z_js), each (num_paths, num_steps) float32; z1/z2 are
        Brownian *increments of a unit-horizon motion scaled back to unit
        normals* — i.e. dW·√num_steps, so the simulator's √dt scaling applies
        uniformly to both PRNG and QMC drivers.
    """
    dims = 3 * num_steps
    raw = sobol_normals(num_paths, dims, seed=seed)
    bb = jnp.asarray(brownian_bridge_matrix(num_steps))

    # dW (unit horizon) = Z @ bbᵀ; convert to per-step unit normals by √n.
    scale = jnp.sqrt(jnp.float32(num_steps))
    z1 = (raw[:, :num_steps] @ bb.T) * scale
    z2 = (raw[:, num_steps:2 * num_steps] @ bb.T) * scale
    z_js = raw[:, 2 * num_steps:]

    key = jax.random.key(seed + 1)
    u_jump = jax.random.uniform(key, (num_paths, num_steps), jnp.float32)
    return z1, z2, u_jump, z_js
