"""Bit-parallel Pallas kernel parity (interpret mode on CPU).

batch_score_bitpallas must make bit-identical decisions to the numpy
banded DP (align/banded.py) — including the transpose normalization for
len_a > len_b pairs, early failure, first-minimum goal tie-breaks, and
the integer acceptance thresholds. The same kernel runs compiled on real
TPU hardware (bench.py).
"""

import numpy as np
import pytest

from pacbioassembly_tpu.align.banded import align_banded
from pacbioassembly_tpu.align.bitwave import batch_score_bitpallas

from test_scan import make_cases, pack


def check(cases, LA, LB, W, ratio=0.3, min_accept=0):
    A, las, Bm, lbs = pack(cases, LA, LB)
    res = batch_score_bitpallas(
        A, las, Bm, lbs, la_max=LA, w_max=W, ratio=ratio, interpret=True
    )
    n_acc = 0
    for i, (a, b) in enumerate(cases):
        ref = align_banded(a, b, ratio)
        acc = bool(res.accept[i])
        if ref is None:
            assert not acc, i
        else:
            got = (
                int(res.cost[i]),
                int(res.matlen_a[i]),
                int(res.matlen_b[i]),
                int(res.diag_cost[i]),
            )
            want = (ref.cost, ref.matlen_a, ref.matlen_b, ref.diag_cost)
            assert acc and got == want, (i, acc, got, want)
            n_acc += 1
    assert n_acc >= min_accept
    return n_acc


def test_bitwave_interpret_matches_numpy():
    rng = np.random.default_rng(21)
    cases = make_cases(rng, 24, max_len=48)
    check(cases, 56, 56, 20, min_accept=5)


def test_bitwave_long_pairs_and_edges():
    """Interior-style pairs (ref side longer -> transpose path) plus
    empty/单-base edge cases."""
    rng = np.random.default_rng(3)
    cases = []
    for _ in range(20):
        n = int(rng.integers(150, 384))
        src = rng.integers(0, 4, 600).astype(np.uint8)
        b = src[:n].copy()
        nm = int(rng.uniform(0.05, 0.25) * n)
        pos = rng.choice(n, nm, replace=False)
        b[pos] = (b[pos] + rng.integers(1, 4, nm)) % 4
        la = int(rng.integers(60, 500))
        cases.append((src[:la].copy(), b))
    cases.append((np.zeros(0, np.uint8), np.array([1, 2, 3], np.uint8)))
    cases.append((np.array([1, 2, 3], np.uint8), np.zeros(0, np.uint8)))
    cases.append((np.array([2], np.uint8), np.array([2], np.uint8)))
    cases.append((np.array([1], np.uint8), rng.integers(0, 4, 380).astype(np.uint8)))
    cases.append((rng.integers(0, 4, 500).astype(np.uint8), np.array([3], np.uint8)))
    check(cases, 501, 384, 116, min_accept=15)


def test_bitwave_reject_heavy_and_ratio015():
    rng = np.random.default_rng(9)
    cases = [
        (
            rng.integers(0, 4, int(rng.integers(1, 500))).astype(np.uint8),
            rng.integers(0, 4, int(rng.integers(1, 384))).astype(np.uint8),
        )
        for _ in range(16)
    ]
    check(cases, 501, 384, 116)

    cases3 = []
    for _ in range(12):
        n = int(rng.integers(100, 300))
        src = rng.integers(0, 4, 400).astype(np.uint8)
        b = src[:n].copy()
        nm = int(0.08 * n)
        pos = rng.choice(n, nm, replace=False)
        b[pos] = (b[pos] + rng.integers(1, 4, nm)) % 4
        cases3.append((src[: int(rng.integers(50, 400))].copy(), b))
    check(cases3, 400, 300, 60, ratio=0.15, min_accept=6)


def test_bitwave_maskless_kogge_stone_parity(monkeypatch):
    """PBTPU_BITWAVE_KSMASK=0 drops the provably-redundant wrap masks in
    the carry prefix (an op-count experiment, see benchmarks/ks_ablation.py);
    the maskless kernel must still match the numpy root bit for bit."""
    from pacbioassembly_tpu.align import bitwave

    batch_score_bitpallas.clear_cache()
    monkeypatch.setattr(bitwave, "_KSMASK", False)
    try:
        rng = np.random.default_rng(21)
        cases = make_cases(rng, 24, max_len=48)
        check(cases, 56, 56, 20, min_accept=5)
    finally:
        batch_score_bitpallas.clear_cache()


def test_bitwave_band_overflow_rejected():
    """Pairs whose max_dst exceeds the static w_max are rejected."""
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, 200).astype(np.uint8)
    res = batch_score_bitpallas(
        a[None, :],
        np.array([200], np.int32),
        a[None, :],
        np.array([200], np.int32),
        la_max=200,
        w_max=20,
        ratio=0.3,
        interpret=True,
    )
    assert not bool(res.accept[0])
