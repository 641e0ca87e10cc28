"""Pallas wavefront kernel parity (interpret mode on CPU).

The same kernel runs compiled on real TPU hardware (bench.py); interpret
mode checks the exact DP semantics against the numpy aligner.
"""

import numpy as np
import pytest

from pacbioassembly_tpu.align.banded import align_banded
from pacbioassembly_tpu.align.wavefront import batch_score_pallas

from test_scan import make_cases, pack


def test_pallas_interpret_matches_numpy():
    rng = np.random.default_rng(21)
    cases = make_cases(rng, 16, max_len=48)
    LA, LB, W = 56, 56, 20
    A, las, Bm, lbs = pack(cases, LA, LB)
    res = batch_score_pallas(
        A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3, interpret=True,
    )
    accept = np.asarray(res.accept)
    cost = np.asarray(res.cost)
    ma = np.asarray(res.matlen_a)
    mb = np.asarray(res.matlen_b)
    dc = np.asarray(res.diag_cost)
    n_acc = 0
    for i, (a, b) in enumerate(cases):
        ref = align_banded(a, b, 0.3)
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
            n_acc += 1
    assert n_acc >= 5
