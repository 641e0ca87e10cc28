"""Batched JAX scorer vs the exact numpy aligner (differential parity)."""

import numpy as np
import pytest

from pacbioassembly_tpu.align.banded import align_banded
from pacbioassembly_tpu.align.scan import batch_score


def make_cases(rng, n, max_len=60):
    cases = []
    for trial in range(n):
        la = int(rng.integers(1, max_len))
        a = rng.integers(0, 4, la).astype(np.uint8)
        if trial % 3 == 0:
            b = rng.integers(0, 4, int(rng.integers(1, max_len))).astype(np.uint8)
        else:
            b = a.copy()
            for _ in range(int(rng.integers(0, max(1, la // 3)))):
                k = int(rng.integers(0, len(b)))
                op = int(rng.integers(0, 3))
                if op == 0:
                    b[k] = rng.integers(0, 4)
                elif op == 1 and len(b) > 1:
                    b = np.delete(b, k)
                else:
                    b = np.insert(b, k, rng.integers(0, 4))
        cases.append((a, b))
    return cases


def pack(cases, LA, LB):
    B = len(cases)
    A = np.zeros((B, LA), np.uint8)
    Bm = np.zeros((B, LB), np.uint8)
    las = np.zeros(B, np.int32)
    lbs = np.zeros(B, np.int32)
    for i, (a, b) in enumerate(cases):
        A[i, : len(a)] = a
        Bm[i, : len(b)] = b
        las[i] = len(a)
        lbs[i] = len(b)
    return A, las, Bm, lbs


@pytest.mark.parametrize("ratio", [0.3, 0.15])
def test_scan_matches_numpy(ratio):
    rng = np.random.default_rng(11)
    cases = make_cases(rng, 40)
    LA, LB, W = 72, 72, 24
    A, las, Bm, lbs = pack(cases, LA, LB)
    res = batch_score(A, las, Bm, lbs, la_max=LA, w_max=W, ratio=ratio)
    accept = np.asarray(res.accept)
    cost = np.asarray(res.cost)
    ma = np.asarray(res.matlen_a)
    mb = np.asarray(res.matlen_b)
    dc = np.asarray(res.diag_cost)
    n_accepted = 0
    for i, (a, b) in enumerate(cases):
        ref = align_banded(a, b, ratio)
        if ref is None:
            assert not accept[i], i
        else:
            assert accept[i], i
            assert (cost[i], ma[i], mb[i], dc[i]) == (
                ref.cost,
                ref.matlen_a,
                ref.matlen_b,
                ref.diag_cost,
            ), i
            n_accepted += 1
    assert n_accepted > 5  # sanity: the batch exercises the accept path


def test_scan_rejects_band_overflow():
    """Pairs whose max_dst exceeds the static w_max are rejected, mirroring
    the reference's MAXM rejection (seq_aligner.h:104-107)."""
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, 64).astype(np.uint8)
    cases = [(a, a)]
    A, las, Bm, lbs = pack(cases, 64, 64)
    res = batch_score(A, las, Bm, lbs, la_max=64, w_max=8, ratio=0.3)
    # max_dst = 1 + 19 = 20 > w_max=8 -> rejected
    assert not bool(res.accept[0])


def test_batch_ladder_padding_invariant():
    """score_batch pads B up a geometric ladder for jit-cache stability;
    results must be independent of the padding (sliced back to B)."""
    from pacbioassembly_tpu.align.screen import ladder_size, score_batch

    assert ladder_size(1) == 64
    assert ladder_size(64) == 64
    assert ladder_size(65) == 128
    assert ladder_size(129) == 256
    assert ladder_size(719) == 1024

    rng = np.random.default_rng(9)
    cases = make_cases(rng, 5, max_len=48)
    A, las, Bm, lbs = pack(cases, 64, 64)
    res = score_batch(A, las, Bm, lbs, la_max=64, w_max=24, ratio=0.3)
    assert len(np.asarray(res.accept)) == 5
    direct = batch_score(A, las, Bm, lbs, la_max=64, w_max=24, ratio=0.3)
    np.testing.assert_array_equal(np.asarray(res.accept), np.asarray(direct.accept))
    np.testing.assert_array_equal(np.asarray(res.cost), np.asarray(direct.cost))
