"""In-suite randomized parity fuzzing vs the compiled reference.

Compiles the unmodified reference assembler out-of-tree on first use
(skipped when the reference tree or toolchain is unavailable) and runs a
few randomized trials of tests/fuzz_reference_parity.one_trial — full
byte-parity including all three quirk emulations.
"""

import os
import shutil
import subprocess

import pytest

REFERENCE_SRC = "/root/reference/src/spaced_seed.cpp"
REFBIN_DIR = "/tmp/refbin"
REFBIN = os.path.join(REFBIN_DIR, "spaced_seed")


def _ensure_reference_binary() -> bool:
    if os.path.exists(REFBIN):
        return True
    if not os.path.exists(REFERENCE_SRC) or shutil.which("g++") is None:
        return False
    os.makedirs(REFBIN_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-fpermissive", "-Wno-deprecated",
             "-I", os.path.dirname(REFERENCE_SRC), "-o", REFBIN, REFERENCE_SRC],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception:
        return False


@pytest.mark.parametrize("seed", [100, 101, 102])
def test_randomized_byte_parity(seed):
    if not _ensure_reference_binary():
        pytest.skip("reference sources / toolchain unavailable")
    from fuzz_reference_parity import one_trial

    msg = one_trial(seed)
    assert msg == "", msg
