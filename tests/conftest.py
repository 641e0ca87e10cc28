"""Test harness config.

Runs JAX on CPU with 8 virtual devices so sharding/collective tests work
without TPU hardware (SURVEY.md §4 "what the TPU build must add").
Must run before anything imports jax.
"""

import os

# Force CPU: the session environment points JAX at the axon TPU tunnel
# (JAX_PLATFORMS=axon), which makes test compiles remote and slow. Tests are
# hermetic on CPU; bench.py is what targets the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The persistent compilation cache is DISABLED for tests by default: with
# ~100 tests' worth of accumulated jit state, the cache WRITE path
# (zstd compress in jax's put_executable_and_time) intermittently dies
# with SIGABRT at the end of the full suite (observed twice at the same
# test, passes standalone). The suite is one process, so the cache only
# helps repeat runs; correctness never depends on it. Opt back in with
# PBTPU_TEST_COMPILE_CACHE=1.
if os.environ.get("PBTPU_TEST_COMPILE_CACHE") == "1":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pbtpu_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
else:
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    # test_tools.py drives the CLI IN-PROCESS, and the CLI entry point
    # calls utils.enable_compilation_cache() — which would re-enable the
    # cache (dir ~/.cache/pbtpu/jax) for the rest of the pytest process.
    # PBTPU_COMPILE_CACHE=0 is that function's kill switch.
    os.environ.setdefault("PBTPU_COMPILE_CACHE", "0")

import jax

# The sitecustomize in PYTHONPATH registers the axon TPU plugin before this
# file runs, so the env var alone may be read too late — force the config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"
REAL_ALIGN = os.path.join(os.path.dirname(__file__), "data", "real_align.txt")


@pytest.fixture(scope="session")
def real_align_pairs():
    """The 6 (ref, read) overlap pairs bundled with the reference tests."""
    with open(REAL_ALIGN) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    return [(lines[i], lines[i + 1]) for i in range(0, len(lines), 2)]
