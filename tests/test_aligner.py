"""Banded-aligner parity tests.

Ports the expectations of reference test/aligner_test.cpp:44-117 (exact
costs, match lengths, first-edit ops, edit-value invariants, and the
real_align.txt pass/fail pair), run against both the numpy and the native
C++ backends.

Accessor convention: a reference `seq_accessor(p, forward, l)` is
materialized as a code array in reading order — forward: text[p : p+l];
backward: text[p-l+1 : p+1] reversed.
"""

import numpy as np
import pytest

from pacbioassembly_tpu.align import MATCH, INSERT, DELETE, align_banded
from pacbioassembly_tpu.codec import dna
from pacbioassembly_tpu.native import pbcore

DNA_REF = "ACGTAACCGGTT"
DNA_SEG1 = "CGTAAGC"
DNA_SEG2 = "GTAACGGGTTAA"
DNA_SEG3 = "TCGTAAC"


def fwd(text, start, length):
    return dna.text_to_codes(text)[start : start + length]


def bwd(text, start, length):
    return dna.text_to_codes(text)[start - length + 1 : start + 1][::-1]


def native_align(a, b, ratio=0.3):
    lib = pbcore.load()
    return pbcore.align(lib, a, b, ratio)


BACKENDS = [align_banded, native_align]


def check_edit_values(res, b_codes):
    """edit_tester (aligner_test.cpp:29-41): MATCH/INSERT vals must equal the
    b-side sequence in order."""
    j = 0
    for op, val in zip(res.ops, res.vals):
        if op in (MATCH, INSERT):
            assert val == b_codes[j], (j, op, val, b_codes[j])
            j += 1


@pytest.mark.parametrize("align", BACKENDS)
def test_forward(align):
    # (aligner_test.cpp:44-66) — align(a=seg, b=ref)
    a = fwd(DNA_SEG1, 0, 6)
    b = fwd(DNA_REF, 0, 7)
    res = align(a, b)
    assert res is not None
    assert 6 <= res.matlen_b <= 7
    assert res.cost == 2
    check_edit_values(res, b)

    a = fwd(DNA_SEG1, 0, 7)
    b = fwd(DNA_REF, 0, 8)
    res = align(a, b)
    assert res is not None and res.matlen_b == 7
    assert res.cost == 2
    check_edit_values(res, b)

    a = fwd(DNA_SEG3, 0, 7)
    b = fwd(DNA_REF, 0, 8)
    res = align(a, b)
    assert res is not None and res.matlen_b == 7
    assert res.cost == 1
    check_edit_values(res, b)


@pytest.mark.parametrize("align", BACKENDS)
def test_backward(align):
    # (aligner_test.cpp:68-74)
    a = bwd(DNA_SEG1, 6, 7)
    b = bwd(DNA_REF, 7, 7)
    res = align(a, b)
    assert res is not None and res.matlen_b == 7
    assert res.cost == 1
    check_edit_values(res, b)


@pytest.mark.parametrize("align", BACKENDS)
def test_overlay(align):
    # (aligner_test.cpp:76-82)
    a = fwd(DNA_SEG2, 0, 12)
    b = fwd(DNA_REF, 2, 10)
    res = align(a, b)
    assert res is not None and res.matlen_b == 10
    assert res.cost == 1
    check_edit_values(res, b)


@pytest.mark.parametrize("align", BACKENDS)
def test_remove_shift_asymmetry(align):
    # (aligner_test.cpp:84-98): shift-by-one begins with INSERT one way and
    # DELETE the other.
    a = fwd(DNA_REF, 1, 9)
    b = fwd(DNA_REF, 0, 10)
    res = align(a, b)
    assert res is not None and res.matlen_b == 10
    assert res.nedit == 10
    assert res.ops[0] == INSERT
    assert res.cost == 1
    check_edit_values(res, b)

    res = align(b, a)
    assert res is not None and res.matlen_b == 9
    assert res.nedit == 10
    assert res.ops[0] == DELETE
    assert res.cost == 1
    check_edit_values(res, a)


@pytest.mark.parametrize("align", BACKENDS)
def test_real_align_samples(align, real_align_pairs):
    # (aligner_test.cpp:100-117): pair 1 aligns backward; pair 2 fails forward.
    ref_str, seg_str = real_align_pairs[0]
    a = bwd(seg_str, len(seg_str) - 1, len(seg_str))
    b = bwd(ref_str, len(ref_str) - 1, len(ref_str))
    res = align(a, b)
    assert res is not None and res.matlen_b > 0
    check_edit_values(res, b)

    ref_str, seg_str = real_align_pairs[1]
    a = fwd(seg_str, 0, len(seg_str))
    b = fwd(ref_str, 0, len(ref_str))
    assert align(a, b) is None


def test_numpy_native_identical_on_real_pairs(real_align_pairs):
    lib = pbcore.load()
    for ref_str, seg_str in real_align_pairs:
        for direction in ("f", "b"):
            if direction == "f":
                a = fwd(seg_str, 0, len(seg_str))
                b = fwd(ref_str, 0, len(ref_str))
            else:
                a = bwd(seg_str, len(seg_str) - 1, len(seg_str))
                b = bwd(ref_str, len(ref_str) - 1, len(ref_str))
            r1 = align_banded(a, b)
            r2 = pbcore.align(lib, a, b)
            if r1 is None:
                assert r2 is None
                continue
            assert r2 is not None
            assert (r1.matlen_a, r1.matlen_b, r1.cost) == (
                r2.matlen_a,
                r2.matlen_b,
                r2.cost,
            )
            np.testing.assert_array_equal(r1.ops, r2.ops)
            sel = r1.ops != DELETE
            np.testing.assert_array_equal(r1.vals[sel], r2.vals[sel])


def test_simd_scalar_differential_fuzz():
    """pb_align's AVX2 row kernel must produce byte-identical outputs
    (rc, meta, edit stream) to the reference scalar row loop — the
    min-plus prefix-scan reformulation and the equality-derived parents
    (pbcore.cpp dp_row_avx2) are exact, not approximate. Covers both
    geometry regimes (len_a vs len_b), all ratio tiers, and near-random
    pairs that exercise rejection + early failure."""
    lib = pbcore.load()
    rng = np.random.default_rng(1234)
    n_accept = 0
    for trial in range(300):
        la = int(rng.integers(1, 500))
        lb = int(rng.integers(1, 500))
        ratio = float(rng.choice([0.1, 0.15, 0.3, 0.5]))
        if rng.random() < 0.5:
            src = rng.integers(0, 4, max(la, lb)).astype(np.uint8)
            a, b = src[:la].copy(), src[:lb].copy()
            for arr in (a, b):
                npos = int(len(arr) * rng.random() * 0.3)
                pos = rng.choice(len(arr), npos, replace=False)
                arr[pos] = (arr[pos] + rng.integers(1, 4, npos)) % 4
        else:
            a = rng.integers(0, 4, la).astype(np.uint8)
            b = rng.integers(0, 4, lb).astype(np.uint8)
        r1 = pbcore.align(lib, a, b, ratio)
        r2 = pbcore.align(lib, a, b, ratio, scalar=True)
        if r1 is None:
            assert r2 is None, (trial, la, lb, ratio)
            continue
        assert r2 is not None, (trial, la, lb, ratio)
        n_accept += 1
        assert (r1.matlen_a, r1.matlen_b, r1.cost, r1.diag_cost) == (
            r2.matlen_a, r2.matlen_b, r2.cost, r2.diag_cost
        ), (trial, la, lb, ratio)
        np.testing.assert_array_equal(r1.ops, r2.ops)
        np.testing.assert_array_equal(r1.vals, r2.vals)
    assert n_accept > 30  # the fuzz must exercise real accepted paths
