"""tools/postprocess.py: contig containment dedup + read accounting.

Closes the two output-hygiene gaps of automated multi-contig mode: the
reference's manual -f restart workflow (README.mkd:52-63) left redundant
contigs and unconsumed-read accounting to the operator.
"""

import numpy as np

from pacbioassembly_tpu.tools.postprocess import (
    classify_reads,
    contig_containment,
    dedupe_contigs,
)


def _mutate(rng, codes, rate):
    c = codes.copy()
    pos = rng.choice(len(c), int(len(c) * rate), replace=False)
    c[pos] = (c[pos] + rng.integers(1, 4, len(pos))) % 4
    return c


def test_dedupe_contained_contig_dropped():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, 200_000).astype(np.uint8)
    big = _mutate(rng, g[10_000:110_000], 0.02)
    contained = _mutate(rng, g[40_000:43_000], 0.03)  # inside big's region
    elsewhere = _mutate(rng, g[150_000:153_000], 0.03)  # not covered
    # 50% overlap with big: must be KEPT (overlap is not containment)
    partial = _mutate(rng, np.concatenate([g[100_000:110_000], g[110_000:120_000]]), 0.02)

    kept, dropped = dedupe_contigs([big, contained, elsewhere, partial])
    assert kept == [0, 2, 3]
    assert len(dropped) == 1
    assert dropped[0]["idx"] == 1 and dropped[0]["into"] == 0
    assert dropped[0]["covered"] > 0.9


def test_containment_fraction():
    rng = np.random.default_rng(8)
    g = rng.integers(0, 4, 100_000).astype(np.uint8)
    from pacbioassembly_tpu.tools.coverage import _unique_anchors

    keys, pos = _unique_anchors(g)
    inside = _mutate(rng, g[20_000:30_000], 0.03)
    outside = rng.integers(0, 4, 10_000).astype(np.uint8)
    half = np.concatenate([inside[:5_000], outside[:5_000]])
    assert contig_containment(inside, keys, pos) > 0.95
    assert contig_containment(outside, keys, pos) < 0.05
    assert 0.4 < contig_containment(half, keys, pos) < 0.6


def test_classify_reads_categories():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 4, 80_000).astype(np.uint8)
    contig = _mutate(rng, g[0:60_000], 0.02)
    pattern = 0xFFFFFFFF

    mapped_read = _mutate(rng, g[20_000:22_000], 0.05)
    junk_read = rng.integers(0, 4, 2_000).astype(np.uint8)
    offcontig_read = _mutate(rng, g[62_000:64_000], 0.05)  # region not assembled
    # head seeds hit, but the read as a whole cannot align
    seeded_only_read = np.concatenate(
        [g[30_000:30_100], rng.integers(0, 4, 1_900).astype(np.uint8)]
    )
    short_read = g[5_000:5_300].copy()
    # head is junk, tail matches: only the BACKWARD pass can map it
    bwd_read = np.concatenate(
        [rng.integers(0, 4, 300).astype(np.uint8), _mutate(rng, g[10_000:11_500], 0.05)]
    )

    res = classify_reads(
        [contig],
        [mapped_read, junk_read, offcontig_read, seeded_only_read, short_read, bwd_read],
        pattern,
        ratio=0.3,
    )
    cat = res["categories"]
    assert cat[0] == 0, res  # mapped
    assert cat[1] == 2  # unseedable junk
    assert cat[2] == 2  # region not in the contig
    assert cat[3] == 1  # seeded but unalignable
    assert cat[4] == 3  # too short
    assert cat[5] == 0  # mapped by the backward pass
    assert res["total"] == 6 and res["mapped"] == 2 and res["too_short"] == 1
