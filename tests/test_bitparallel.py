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


def test_batched_wordvector_matches_banded():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_scan import make_cases, pack
    from pacbioassembly_tpu.align.bitscan import batch_score_bp

    rng = np.random.default_rng(5)
    cases = make_cases(rng, 32, max_len=80)
    LA, LB, W = 96, 96, 32
    A, las, Bm, lbs = pack(cases, LA, LB)
    res = batch_score_bp(A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3)
    acc = np.asarray(res.accept)
    cost = np.asarray(res.cost)
    ma = np.asarray(res.matlen_a)
    mb = np.asarray(res.matlen_b)
    dc = np.asarray(res.diag_cost)
    n_acc = 0
    for i, (a, b) in enumerate(cases):
        ref = align_banded(a, b, 0.3)
        if ref is None:
            assert not acc[i], i
            continue
        assert acc[i], i
        assert (cost[i], ma[i], mb[i], dc[i]) == (
            ref.cost, ref.matlen_a, ref.matlen_b, ref.diag_cost), i
        n_acc += 1
    assert n_acc >= 10
