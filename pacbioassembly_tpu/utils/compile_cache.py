"""Persistent XLA/Mosaic compilation cache.

First-compile of the Pallas kernels costs 5s-5min per process (worse over
the axon TPU tunnel); the JAX persistent cache eliminates it for repeat
processes (measured 33s -> 2s). Enabled by the CLI entry point and
bench.py; PBTPU_COMPILE_CACHE overrides the directory, =0 disables.

Must be called before the first jit compilation (not before import).
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    cfg = os.environ.get("PBTPU_COMPILE_CACHE", "")
    if cfg == "0":
        return
    path = cfg or os.path.join(
        os.path.expanduser("~"), ".cache", "pbtpu", "jax"
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
