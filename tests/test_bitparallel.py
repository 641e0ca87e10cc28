"""Banded Myers bit-parallel scorer vs the banded DP (exactness root)."""

import numpy as np
import pytest

from pacbioassembly_tpu.align.banded import align_banded
from pacbioassembly_tpu.align.bitparallel import bp_score


def _mutate(rng, a):
    b = a.copy()
    for _ in range(int(rng.integers(0, max(1, len(a) // 3)))):
        k = int(rng.integers(0, len(b)))
        op = int(rng.integers(0, 3))
        if op == 0:
            b[k] = rng.integers(0, 4)
        elif op == 1 and len(b) > 1:
            b = np.delete(b, k)
        else:
            b = np.insert(b, k, rng.integers(0, 4))
    return b


@pytest.mark.parametrize("ratio", [0.3, 0.15, 0.45])
def test_bitparallel_matches_banded(ratio):
    rng = np.random.default_rng(42)
    n_acc = 0
    for trial in range(150):
        la = int(rng.integers(1, 90))
        a = rng.integers(0, 4, la).astype(np.uint8)
        if trial % 3 == 0:
            b = rng.integers(0, 4, int(rng.integers(1, 90))).astype(np.uint8)
        else:
            b = _mutate(rng, a)
        ref = align_banded(a, b, ratio)
        got = bp_score(a, b, ratio)
        want = None if ref is None else (ref.cost, ref.matlen_a, ref.matlen_b, ref.diag_cost)
        assert got == want, (trial, a.tolist(), b.tolist())
        n_acc += want is not None
    assert n_acc > 30


def test_bitparallel_long_reads():
    rng = np.random.default_rng(9)
    for t in range(6):
        n = int(rng.integers(700, 1600))
        a = rng.integers(0, 4, n).astype(np.uint8)
        b = _mutate(rng, a)
        if t % 3 == 1:
            b = b[: len(b) // 3]
        ref = align_banded(a, b, 0.3)
        got = bp_score(a, b, 0.3)
        want = None if ref is None else (ref.cost, ref.matlen_a, ref.matlen_b, ref.diag_cost)
        assert got == want
