"""tools/coverage.py: genome-fraction / N50 evaluation of an assembly.

No reference analogue (the reference only measured locator residual,
doc/final.tex:266-277); this pins the unique-16-mer anchoring method used
by benchmarks/ecoli_scale.py's whole-genome summaries.
"""

import numpy as np

from pacbioassembly_tpu.tools.coverage import (
    _kmers,
    _nx,
    _union_len,
    contig_intervals,
    evaluate_assembly,
)


def test_kmers_and_union():
    codes = np.array([0, 1, 2, 3] * 5, dtype=np.uint8)  # len 20 -> 5 kmers
    km = _kmers(codes)
    assert km.shape == (5,)
    assert km[0] == km[4]  # period-4 sequence: kmers repeat
    assert _union_len([(0, 10), (5, 15), (20, 25)]) == 20
    assert _nx([30, 20, 10], 60) == 30  # 30 >= 30 alone
    assert _nx([30, 20, 10], 90) == 20  # needs 30+20 >= 45
    assert _nx([10], 100) == 0  # never reaches half the denom


def test_evaluate_assembly_coverage_and_noise():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, 100_000).astype(np.uint8)
    # contig 1: genome[10k:40k) with 1% substitutions
    c1 = g[10_000:40_000].copy()
    pos = rng.choice(len(c1), len(c1) // 100, replace=False)
    c1[pos] = (c1[pos] + 1) % 4
    # contig 2: genome[60k:90k) exact; contig 3: junk
    c2 = g[60_000:90_000].copy()
    junk = rng.integers(0, 4, 5_000).astype(np.uint8)

    r = evaluate_assembly(g, [c1, c2, junk])
    assert r["genome_len"] == 100_000
    assert r["assembly_len"] == 65_000
    # both real contigs found end to end, junk contributes nothing
    assert r["genome_covered"] == 60_000
    assert r["genome_fraction"] == 0.6
    assert r["per_contig"][0]["intervals"] == [[10_000, 40_000]]
    assert r["per_contig"][1]["intervals"] == [[60_000, 90_000]]
    assert r["per_contig"][2]["intervals"] == []
    assert r["n50"] == 30_000 and r["ng50"] == 30_000


def test_contig_intervals_gap_split():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 4, 50_000).astype(np.uint8)
    from pacbioassembly_tpu.tools.coverage import _unique_anchors

    keys, pos = _unique_anchors(g)
    # a chimeric contig spanning two distant genome regions must yield two
    # intervals, not one bridged span
    chim = np.concatenate([g[5_000:10_000], g[30_000:35_000]])
    iv = contig_intervals(chim, keys, pos)
    assert iv == [(5_000, 10_000), (30_000, 35_000)]
