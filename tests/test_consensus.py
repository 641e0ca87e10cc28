"""Consensus parity tests — port of reference test/ref_test.cpp:18-254.

Covers ballot semantics (base_vote/vote_box thresholds and ties), accessor/
containment/seedmap behavior, growth, and the full align->vote->evolve
integration scenarios for substitutions, deletions, single/double
insertions (both directions), and end extension by append/prepend.
"""

import numpy as np
import pytest

from pacbioassembly_tpu.align import exact_align
from pacbioassembly_tpu.codec import dna
from pacbioassembly_tpu.consensus import ConsensusRef
from pacbioassembly_tpu.index import build_seedmap

DNA_TXT = "ACGTAACCGGTTAAACCCGGGTTTTGCAAAAAAAAAAAAAAAA"
DNA_TXT1 = "ACGTAACCGGTTAAACCCGGGTGTTGCAAAAAAAAAAAAAAAA"
DNA_TXT2 = "ACGTAACCGGTTAAACCCGGGTTGTTGCAAAAAAAAAAAAAAAA"
DNA_TXT3 = "ACGTAACCGGTTAAACCCGGGTTGGTTGCAAAAAAAAAAAAAAAA"
DNA_TXT4 = "ACGTAACCGGTTAAACCCGGGTTGTTGCAAAAAAAAAAAAAAAAGGCCTTAA"
DNA_TXT5 = "ACGTAACCGGTTAAACCCGGGTTGTTGCAAAAAAAAAAAAAAAAGGCCTTAAC"
DNA_TXT6 = "TTTTACGTAACCGGTTAAACCCGGGTTGTTGCAAAAAAAAAAAAAAAA"
DNA_TXT7 = "TTTTTACGTAACCGGTTAAACCCGGGTTGTTGCAAAAAAAAAAAAAAAA"
DNA_POST = "CGT"
DNA_PRE = "TGC"

SZ = len(DNA_TXT)


def codes(s):
    return dna.text_to_codes(s)


def fwd_seg(s, start=0, length=None):
    c = codes(s)
    length = len(c) - start if length is None else length
    return c[start : start + length]


def bwd_seg(s, start=None, length=None):
    c = codes(s)
    start = len(c) - 1 if start is None else start
    length = start + 1 if length is None else length
    return c[start - length + 1 : start + 1][::-1]


@pytest.fixture
def ref():
    # SetUp (ref_test.cpp:84-91): small capacity keeps tests fast.
    # overlap_min=16: the reference's shipped gtest scenarios use 43-bp
    # sequences, which its shipped OVERLAP_MIN=64 rejects (verified by
    # compiling ref_seq.h: try_align returns false with matlen_a=43); the
    # scenarios pin the vote/evolve semantics, so run them below the
    # rejection threshold. The 64-threshold itself is pinned by
    # test_overlap_min_rejection.
    return ConsensusRef(codes(DNA_TXT), capacity=3 * 4096, overlap_min=16)


# ------------------------------------------------------------------ ballots
# base_vote/vote_box semantics are embedded in the tensor ops; replicate the
# gtest ballot scenarios directly against a tiny ConsensusRef.


def test_base_vote_winner_and_ties():
    # (ref_test.cpp:18-37) A>C>G>T tie preference via first-max argmax
    v = np.zeros(4, np.int32)
    v[dna.CHAR2CODE[ord("A")]] += 1
    assert int(v.argmax()) == 0  # 'A'
    v[1] += 2
    assert int(v.argmax()) == 1  # 'C' with 2 votes
    v[2] += 3
    assert int(np.argmax(v)) == 2  # 'G' with 3
    v = np.zeros(4, np.int32)
    v[3] = 1
    assert int(v.argmax()) == 3  # 'T'


def test_vote_box_thresholds():
    # (ref_test.cpp:39-69) strict > ratio*total semantics
    ref = ConsensusRef(codes("T"), capacity=3 * 64)
    o = ref.origin
    assert ref.sel[o].max() > 0.5 * ref.total[o]          # is_valid
    assert not (ref.sup[o].max() > 0.5 * ref.total[o])    # has_supply

    ref.total[o] += 1  # ignore()
    assert not (ref.sel[o].max() > 0.5 * ref.total[o])

    ref.sel[o, 1] += 1
    ref.total[o] += 1  # select('C')
    assert not (ref.sel[o].max() > 0.5 * ref.total[o])

    ref.sel[o, 1] += 2
    ref.total[o] += 2  # select('C') x2
    assert ref.sel[o].max() > 0.5 * ref.total[o]
    assert int(ref.sel[o].argmax()) == 1  # 'C'
    assert ref.total[o] == 5

    ref.sup[o, 3] += 2  # supply('T') x2
    assert not (ref.sup[o].max() > 0.5 * ref.total[o])
    ref.sup[o, 3] += 1
    assert ref.sup[o].max() > 0.5 * ref.total[o]
    assert int(ref.sup[o].argmax()) == 3  # 'T'


# ------------------------------------------------------------------ basic


def test_basic_accessors_and_seedmap(ref):
    # (ref_test.cpp:100-129)
    assert ref.length() == SZ
    assert not ref.contained(-1)
    assert ref.contained(0)
    assert ref.contained(SZ - 1)
    assert not ref.contained(SZ)

    np.testing.assert_array_equal(ref.accessor(0, True), codes(DNA_TXT))
    np.testing.assert_array_equal(ref.accessor(SZ - 1, False), codes(DNA_TXT)[::-1])

    idx, n_indexed = build_seedmap(ref.text(), 0xFFFFFFFF)
    # -1 for the trailing all-A seed (ref_test.cpp:119-128)
    assert idx.n_keys == SZ - 15 - 1
    txt_codes = codes(DNA_TXT)
    for i in range(SZ - 16):
        assert len(idx.lookup(dna.encode_seed(txt_codes, i))) > 0
    # the trailing poly-A seed (masked value 0) is excluded
    assert len(idx.lookup(0)) == 0
    assert len(idx.lookup(dna.encode_seed(txt_codes, SZ - 16))) == 0


def test_grow(ref):
    # (ref_test.cpp:131-142)
    ref.append(codes(DNA_POST))
    assert ref.contained(SZ + len(DNA_POST) - 1)
    assert not ref.contained(SZ + len(DNA_POST))
    ref.prepend(codes(DNA_PRE))
    assert ref.contained(-len(DNA_PRE))
    assert not ref.contained(-len(DNA_PRE) - 1)
    assert ref.length() == SZ


# ------------------------------------------------------------------ integration


def test_change_substitution(ref):
    # (ref_test.cpp:144-154): two segments voting the substitution win
    seg = fwd_seg(DNA_TXT1)
    assert ref.try_align(exact_align, 0, seg, True) is not None
    assert ref.try_align(exact_align, 0, seg, True) is not None
    ref.evolve()
    np.testing.assert_array_equal(ref.text(), codes(DNA_TXT1))


def test_remove_deletion(ref):
    # (ref_test.cpp:156-166)
    seg = fwd_seg(DNA_TXT, 1)
    assert ref.try_align(exact_align, 0, seg, True) is not None
    assert ref.try_align(exact_align, 0, seg, True) is not None
    ref.evolve()
    assert ref.length() == SZ - 1
    np.testing.assert_array_equal(ref.text(), codes(DNA_TXT)[1:])


def test_insert_single(ref):
    # (ref_test.cpp:168-178)
    seg = fwd_seg(DNA_TXT2)
    res = ref.try_align(exact_align, 0, seg, True)
    assert res is not None and res.nedit == len(DNA_TXT2)
    assert ref.try_align(exact_align, 0, seg, True) is not None
    ref.evolve()
    assert ref.length() == len(DNA_TXT2)
    np.testing.assert_array_equal(ref.text(), codes(DNA_TXT2))


def test_insert_double(ref):
    # (ref_test.cpp:180-189): double insertion collapses to one supplement
    seg = fwd_seg(DNA_TXT3)
    assert ref.try_align(exact_align, 0, seg, True) is not None
    ref.evolve()
    assert ref.length() == SZ + 1
    np.testing.assert_array_equal(ref.text(), codes(DNA_TXT2)[: SZ + 1])


def test_back_insert(ref):
    # (ref_test.cpp:191-207)
    seg = bwd_seg(DNA_TXT2)
    res = ref.try_align(exact_align, SZ - 1, seg, False)
    assert res is not None and res.nedit == len(DNA_TXT2)
    assert ref.try_align(exact_align, SZ - 1, seg, False) is not None
    ref.evolve()
    assert ref.length() == len(DNA_TXT2)
    np.testing.assert_array_equal(ref.accessor(len(DNA_TXT2) - 1, False), codes(DNA_TXT2)[::-1])


def test_back_insert2(ref):
    # (ref_test.cpp:209-221)
    seg = bwd_seg(DNA_TXT3)
    res = ref.try_align(exact_align, SZ - 1, seg, False)
    assert res is not None and res.nedit == len(DNA_TXT3)
    ref.evolve()
    assert ref.length() == SZ + 1
    np.testing.assert_array_equal(ref.accessor(SZ, False), codes(DNA_TXT2)[: SZ + 1][::-1])


def test_append_extension(ref):
    # (ref_test.cpp:223-236): boundary-overlapping reads extend the tail
    seg4 = fwd_seg(DNA_TXT4)
    assert ref.try_align(exact_align, 0, seg4, True) is not None
    assert ref.contained(SZ + 1)
    seg5 = fwd_seg(DNA_TXT5)
    assert ref.try_align(exact_align, 0, seg5, True) is not None
    ref.evolve()
    assert ref.length() == len(DNA_TXT5)
    np.testing.assert_array_equal(ref.text(), codes(DNA_TXT5))


def test_prepend_extension(ref):
    # (ref_test.cpp:238-254)
    seg6 = bwd_seg(DNA_TXT6)
    assert ref.try_align(exact_align, SZ - 1, seg6, False) is not None
    assert ref.contained(-1)
    seg7 = bwd_seg(DNA_TXT7)
    assert ref.try_align(exact_align, SZ - 1, seg7, False) is not None
    ref.evolve()
    assert ref.length() == len(DNA_TXT7)
    np.testing.assert_array_equal(
        ref.accessor(len(DNA_TXT7) - 1, False), codes(DNA_TXT7)[::-1]
    )


def test_overlap_min_rejection():
    """With the shipped OVERLAP_MIN=64 (common.h:39), a 43-bp overlap is
    rejected even though the alignment itself succeeds — matches the
    compiled reference's try_align behavior."""
    ref = ConsensusRef(codes(DNA_TXT), capacity=3 * 4096)  # default 64
    assert ref.overlap_min == 64
    assert ref.try_align(exact_align, 0, fwd_seg(DNA_TXT1), True) is None


def test_state_dict_roundtrip(ref):
    seg = fwd_seg(DNA_TXT2)
    ref.try_align(exact_align, 0, seg, True)
    state = ref.state_dict()
    ref2 = ConsensusRef.from_state_dict(state, capacity=3 * 4096)
    ref.evolve()
    ref2.evolve()
    np.testing.assert_array_equal(ref.text(), ref2.text())
    np.testing.assert_array_equal(
        ref.sel[ref.pre : ref.post], ref2.sel[ref2.pre : ref2.post]
    )


def _random_vote_state(rng, L, cap=3 * 4096):
    """A ConsensusRef with randomized vote tensors exercising every evolve
    branch: valid/invalid boxes, supplied splits, absorb chains."""
    base = rng.integers(0, 4, L).astype(np.uint8)
    ref = ConsensusRef(base, capacity=cap, overlap_min=16)
    n = ref.post - ref.pre
    ref.sel[ref.pre : ref.post] = rng.integers(0, 6, (n, 4)).astype(np.int32)
    ref.sup[ref.pre : ref.post] = np.where(
        rng.random((n, 4)) < 0.15, rng.integers(1, 6, (n, 4)), 0
    ).astype(np.int32)
    ref.total[ref.pre : ref.post] = rng.integers(1, 8, n).astype(np.int32)
    # direct tensor writes bypass elect: declare them for incremental evolve
    ref.mark_dirty(ref.pre, ref.post)
    return ref


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_evolve_equals_numpy(seed):
    """The jitted device evolve (consensus/device.py) must be bit-equal to
    the numpy evolve (ref_seq.h:317-349 semantics) on randomized vote
    tensors — every consensus op has a device form (SURVEY.md §3.2)."""
    from pacbioassembly_tpu.consensus.device import evolve_on_device

    rng = np.random.default_rng(seed)
    L = int(rng.integers(50, 400))
    ref_np = _random_vote_state(np.random.default_rng(seed + 100), L)
    ref_dev = _random_vote_state(np.random.default_rng(seed + 100), L)

    ref_np.evolve()
    evolve_on_device(ref_dev)

    assert ref_dev.length() == ref_np.length()
    np.testing.assert_array_equal(ref_dev.text(), ref_np.text())
    np.testing.assert_array_equal(
        ref_dev.sel[ref_dev.pre : ref_dev.post],
        ref_np.sel[ref_np.pre : ref_np.post],
    )
    np.testing.assert_array_equal(
        ref_dev.sup[ref_dev.pre : ref_dev.post],
        ref_np.sup[ref_np.pre : ref_np.post],
    )
    np.testing.assert_array_equal(
        ref_dev.total[ref_dev.pre : ref_dev.post],
        ref_np.total[ref_np.pre : ref_np.post],
    )


def test_device_evolve_after_real_votes(ref):
    """Device evolve after a genuine align->vote cycle matches numpy."""
    from pacbioassembly_tpu.consensus.device import evolve_on_device

    ref2 = ConsensusRef(codes(DNA_TXT), capacity=3 * 4096, overlap_min=16)
    for r, seg in ((ref, fwd_seg(DNA_TXT2)), (ref2, fwd_seg(DNA_TXT2))):
        assert r.try_align(exact_align, 0, seg, True) is not None
    ref.evolve()
    evolve_on_device(ref2)
    np.testing.assert_array_equal(ref.text(), ref2.text())
    np.testing.assert_array_equal(
        ref.sup[ref.pre : ref.post], ref2.sup[ref2.pre : ref2.post]
    )


# ------------------------------------------------------ incremental evolve


def _rand_edits(rng, n):
    """A plausible random edit stream (first edit never INSERT)."""
    from pacbioassembly_tpu.align.types import DELETE, INSERT, MATCH

    ops = rng.choice([MATCH, MATCH, MATCH, DELETE, INSERT], size=n).astype(np.uint8)
    ops[0] = MATCH
    vals = rng.integers(0, 4, n).astype(np.uint8)
    return ops, vals


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_incremental_evolve_equals_full(seed):
    """Incremental (dirty-span) evolve must be bit-identical to the full
    rebuild across multi-round histories with edge growth, edge + interior
    vote clusters, deletions, splits, absorb chains, and retreats. The
    control ref forces the full path every round by discarding dirty
    provenance (_dirty = None)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, 400).astype(np.uint8)
    inc = ConsensusRef(base, capacity=3 * 4096, overlap_min=16)
    full = ConsensusRef(base, capacity=3 * 4096, overlap_min=16)

    for rnd in range(12):
        L = inc.length()
        # 2-5 vote clusters: always one near each edge, rest interior
        starts = [rng.integers(0, max(L // 8, 2))]
        starts.append(L - 1 - rng.integers(0, max(L // 8, 2)))
        for _ in range(rng.integers(0, 3)):
            starts.append(rng.integers(0, max(L - 40, 1)))
        for s in starts:
            n = int(rng.integers(5, 40))
            ops, vals = _rand_edits(rng, n)
            fwd = bool(rng.random() < 0.5)
            pos = int(np.clip(s, 0, L - 1))
            if not fwd:
                pos = int(np.clip(s + n, n, L - 1))
            for r in (inc, full):
                r.elect(pos, ops, vals, fwd)
        if rng.random() < 0.5:
            g = rng.integers(0, 4, rng.integers(1, 30)).astype(np.uint8)
            inc.append(g)
            full.append(g)
        if rng.random() < 0.5:
            g = rng.integers(0, 4, rng.integers(1, 30)).astype(np.uint8)
            inc.prepend(g)
            full.prepend(g)
        full._dirty = None  # force the full path on the control
        inc.evolve()
        full.evolve()
        assert inc.length() == full.length(), f"round {rnd}"
        np.testing.assert_array_equal(inc.text(), full.text(), err_msg=f"round {rnd}")
        np.testing.assert_array_equal(
            inc.sel[inc.pre : inc.post], full.sel[full.pre : full.post]
        )
        np.testing.assert_array_equal(
            inc.sup[inc.pre : inc.post], full.sup[full.pre : full.post]
        )
        np.testing.assert_array_equal(
            inc.total[inc.pre : inc.post], full.total[full.pre : full.post]
        )
        if rnd == 6:
            for r in (inc, full):
                r.total[r.beg + 50 : r.end - 50] = 3
                r.mark_dirty(r.beg + 50, r.end - 50)
                r.retreat_edges(min_total=2, keep_min=16)
    # the runs must have exercised the incremental machinery, not just
    # fallen back (fast = in-place splice, splice = interior-delta rebase)
    assert inc.evolve_stats["fast"] + inc.evolve_stats["splice"] > 0, (
        inc.evolve_stats
    )
