"""Codec parity tests.

The hard-coded seed words pin the exact bit layout to the reference
(test/dna_test.cpp:20-30).
"""

import io

import numpy as np
import pytest

from pacbioassembly_tpu.codec import dna, binary_io

DNA_STR = "ACGTGTCATCGGATCAACCGGTT"


def test_text2bin_roundtrip_and_lengths():
    codes = dna.text_to_codes(DNA_STR)
    rec = np.frombuffer(dna.record_from_codes(codes), dtype=np.uint8)
    # text2bin returns 10 for this 23-mer (dna_test.cpp:23)
    assert len(rec) == 10
    assert int(np.frombuffer(rec[:4].tobytes(), dtype=np.uint32)[0]) == 23
    back = dna.unpack_codes(rec[4:], 23)
    assert dna.codes_to_text(back) == DNA_STR


def test_seed_at_magic_constants():
    codes = dna.text_to_codes(DNA_STR)
    rec = np.frombuffer(dna.record_from_codes(codes), dtype=np.uint8)
    # pinned layout anchors (dna_test.cpp:26-29)
    expected = {0: 0x34DAB41B, 1: 0xD068D36E, 2: 0x41A34DBB, 7: 0xAF058D36}
    for pos, want in expected.items():
        assert dna.seed_at(rec, pos) == want
        assert dna.encode_seed(codes, pos) == want
    # vectorized path agrees everywhere
    n = len(codes) - dna.SEED_LEN
    seeds = dna.encode_seeds(codes, np.arange(n + 1))
    for pos in range(n + 1):
        assert int(seeds[pos]) == dna.encode_seed(codes, pos)
    np.testing.assert_array_equal(seeds, dna.sliding_seeds(codes))


def test_seed_at_quirk_replicates_reference_bug():
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 100).astype(np.uint8)
    rec = np.frombuffer(dna.record_from_codes(codes), dtype=np.uint8)
    # pos 0 / unaligned positions: quirk == correct
    for pos in [0, 1, 2, 3, 5, 7]:
        assert dna.seed_at_quirk(rec, pos) == dna.seed_at(rec, pos)
    # aligned pos > 0: the reference fast path reads byte offset `pos`
    # instead of pos>>2 (dna_seq.h:64)
    payload = rec[4:].astype(np.uint64)
    for pos in [4, 8, 12]:
        buggy = int(
            payload[pos]
            | (payload[pos + 1] << 8)
            | (payload[pos + 2] << 16)
            | (payload[pos + 3] << 24)
        )
        assert dna.seed_at_quirk(rec, pos) == buggy
        assert dna.seed_at_quirk(rec, pos) != dna.seed_at(rec, pos)


def test_c2i_maps_unknown_to_t():
    # C2I: non-A/C/G (including N) -> 3 (dna_seq.h:21)
    codes = dna.text_to_codes("ACGTN X")
    assert codes.tolist() == [0, 1, 2, 3, 3, 3, 3]


def test_pack_unpack_random_roundtrip():
    rng = np.random.default_rng(1)
    for n in [1, 2, 3, 4, 5, 63, 64, 65, 1001]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        packed = dna.pack_codes(codes)
        assert len(packed) == (n + 3) // 4
        np.testing.assert_array_equal(dna.unpack_codes(packed, n), codes)


def test_parse_pattern():
    # '1' -> T(11), '*' -> A(00), zero-padded to 16 (spaced_seed.cpp:166-180)
    full = dna.parse_pattern("1" * 16)
    assert full == 0xFFFFFFFF
    none = dna.parse_pattern("*" * 16)
    assert none == 0
    # first pattern of seeds.txt
    m = dna.parse_pattern("111**111*11*1111")
    # manually: codes T T T A A T T T A T T A T T T T grouped in 4s
    codes = np.array([3 if ch == "1" else 0 for ch in "111**111*11*1111"], np.uint8)
    assert m == dna.encode_seed(codes, 0)


def test_record_file_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    seqs = [rng.integers(0, 4, int(n)).astype(np.uint8) for n in rng.integers(1, 900, 50)]
    path = tmp_path / "reads.bin"
    with open(path, "wb") as fh:
        binary_io.write_records(fh, seqs)
    buf = np.fromfile(path, dtype=np.uint8)
    offsets, lengths = binary_io.scan_records(buf)
    assert len(offsets) == len(seqs)
    np.testing.assert_array_equal(lengths, [len(s) for s in seqs])
    back = list(binary_io.read_records(str(path)))
    for orig, rt in zip(seqs, back):
        np.testing.assert_array_equal(orig, rt)


def test_text_binary_text_pipeline(tmp_path, real_align_pairs):
    """binary_test mode 1 + 2 equivalent on the bundled real reads."""
    lines = [s for pair in real_align_pairs for s in pair]
    path = tmp_path / "real.bin"
    binary_io.texts_to_binary_file(lines, str(path))
    back = list(binary_io.binary_file_to_texts(str(path)))
    assert back == lines
