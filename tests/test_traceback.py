"""Device-side traceback parity: edits identical to the numpy aligner."""

import numpy as np

from pacbioassembly_tpu.align.banded import align_banded
from pacbioassembly_tpu.align.traceback import batch_align_traceback
from pacbioassembly_tpu.align.types import DELETE

from test_scan import make_cases, pack


def test_traceback_matches_numpy_edits():
    rng = np.random.default_rng(17)
    cases = make_cases(rng, 24, max_len=56)
    LA, LB, W = 64, 64, 24
    A, las, Bm, lbs = pack(cases, LA, LB)
    res = batch_align_traceback(A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3)
    acc = np.asarray(res.scores.accept)
    ops = np.asarray(res.ops)
    vals = np.asarray(res.vals)
    ne = np.asarray(res.nedit)
    n_acc = 0
    for i, (a, b) in enumerate(cases):
        ref = align_banded(a, b, 0.3)
        if ref is None:
            assert not acc[i], i
            continue
        assert acc[i], i
        assert ne[i] == ref.nedit, i
        np.testing.assert_array_equal(ops[i, : ne[i]], ref.ops, i)
        sel = ref.ops != DELETE
        np.testing.assert_array_equal(vals[i, : ne[i]][sel], ref.vals[sel], i)
        n_acc += 1
    assert n_acc >= 10
