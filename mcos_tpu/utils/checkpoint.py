"""Checkpoint / resume for calibration state + compilation caching.

The reference has no persistence at all — calibration history and regime
history live in in-memory lists (engine/calibration.py:145,244-251;
engine/regime.py:37,92) and die with the process; its only "cache" is Numba's
on-disk JIT cache (SURVEY.md §5.4). The TPU framework provides:

- `save_calibration` / `load_calibration`: durable SVJParams + history via
  orbax (pytree checkpointing) with a JSON sidecar for human inspection.
- `enable_compilation_cache`: JAX persistent compilation cache, the analogue
  of `cache=True` on the reference's Numba kernel (monte_carlo.py:189) —
  first-compile latency paid once per machine, not per process.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from mcos_tpu.models.params import SVJParams


def enable_compilation_cache(path: str = "/tmp/mcos_tpu_jit_cache") -> None:
    """Persistent XLA compilation cache (Numba cache=True analogue).

    MCOS_DISABLE_JIT_CACHE=1 is the operator escape hatch: the cache's
    native executable serializer has been observed to segfault on some
    large CPU executables (jax compilation_cache.py:238/265 — the reason
    tests/conftest.py hard-disables the cache for the suite), so a CPU
    deployment that trips it can turn persistence off without a code
    change. TPU serving has run clean with the cache all round.
    """
    import jax

    if os.environ.get("MCOS_DISABLE_JIT_CACHE") == "1":
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def save_calibration(directory: str, params: SVJParams,
                     history: Optional[List[Dict]] = None,
                     metadata: Optional[Dict] = None) -> str:
    """Persist calibrated params (+ history) to `directory`.

    Uses orbax for the params pytree and a JSON sidecar for history/metadata.
    Returns the directory path.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)

    ckptr = ocp.StandardCheckpointer()
    tree = {k: np.float32(v) for k, v in params.as_dict().items()}
    ckpt_path = os.path.join(directory, "params")
    ckptr.save(ckpt_path, tree, force=True)
    ckptr.wait_until_finished()

    sidecar = {
        "params": params.as_dict(),
        "history": history or [],
        "metadata": metadata or {},
    }
    with open(os.path.join(directory, "calibration.json"), "w") as f:
        json.dump(sidecar, f, indent=2)
    return directory


def load_calibration(directory: str) -> Tuple[SVJParams, List[Dict], Dict]:
    """Restore (params, history, metadata) saved by `save_calibration`."""
    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "calibration.json")) as f:
        sidecar = json.load(f)
    params = SVJParams(**{k: float(v) for k, v in sidecar["params"].items()})
    return params, sidecar.get("history", []), sidecar.get("metadata", {})
