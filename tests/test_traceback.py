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


def test_traceback_rows_max_equivalent():
    """Bounding the scanned rows (rows_max) must not change any output as
    long as rows_max >= max(la)."""
    rng = np.random.default_rng(23)
    cases = make_cases(rng, 16, max_len=40)
    LA, LB, W = 128, 128, 40  # la_max far above the real lengths
    A, las, Bm, lbs = pack(cases, LA, LB)
    full = batch_align_traceback(A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3)
    bounded = batch_align_traceback(
        A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3,
        rows_max=int(las.max()),
    )
    np.testing.assert_array_equal(
        np.asarray(full.scores.accept), np.asarray(bounded.scores.accept)
    )
    np.testing.assert_array_equal(np.asarray(full.nedit), np.asarray(bounded.nedit))
    for i in range(len(cases)):
        n = int(np.asarray(full.nedit)[i])
        np.testing.assert_array_equal(
            np.asarray(full.ops)[i, :n], np.asarray(bounded.ops)[i, :n]
        )
        np.testing.assert_array_equal(
            np.asarray(full.vals)[i, :n], np.asarray(bounded.vals)[i, :n]
        )
