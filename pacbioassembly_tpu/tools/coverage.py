"""Assembly-vs-genome evaluation: genome fraction covered, N50/NG50.

The reference never measured genome coverage — its evaluation was the
locator residual (doc/final.tex:266-277) on a single contig. A
whole-genome multi-contig assembly needs the complementary metric: how
much of the (known, simulated) genome the contigs jointly cover.

Method: anchor exact unique 16-mers. Every genome position whose 16-mer
occurs exactly once in the genome is an unambiguous anchor; each contig's
16-mers are matched against those anchors (vectorized uint32 join — the
same 2-bit seed encoding as the indexer, dna_seq.h:86-96). At the
assembler's residual error rates (<=5%) an exact 16-mer survives every
few bases, so matched anchor positions are dense inside truly assembled
regions; merging them with a generous gap tolerance (default 1 kb,
anchors in correct regions are ~5 bp apart) yields per-contig genome
intervals whose union is the covered fraction. Pure numpy on host — a
one-shot evaluation tool, not a pipeline stage.
"""

from __future__ import annotations

import numpy as np

K = 16


def _kmers(codes: np.ndarray) -> np.ndarray:
    """(len-15,) uint32 2-bit 16-mers (first base in the high bits —
    ordering is irrelevant here, only equality joins)."""
    n = len(codes) - K + 1
    if n <= 0:
        return np.zeros(0, np.uint32)
    km = np.zeros(n, np.uint32)
    c = codes.astype(np.uint32)
    for k in range(K):
        km = (km << np.uint32(2)) | c[k : k + n]
    return km


def _unique_anchors(genome: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique-in-genome kmers, their genome positions)."""
    km = _kmers(genome)
    order = np.argsort(km, kind="stable")
    ks = km[order]
    # count occurrences of each kmer value
    new = np.empty(len(ks), bool)
    new[:1] = True
    new[1:] = ks[1:] != ks[:-1]
    grp = np.cumsum(new) - 1
    cnt = np.bincount(grp)
    uniq_mask = cnt[grp] == 1
    return ks[uniq_mask], order[uniq_mask].astype(np.int64)


def contig_intervals(
    contig: np.ndarray,
    anchor_keys: np.ndarray,
    anchor_pos: np.ndarray,
    max_gap: int = 1000,
    min_anchors: int = 8,
) -> list[tuple[int, int]]:
    """Genome intervals [lo, hi) this contig covers: matched anchor
    positions, sorted and merged when consecutive anchors are <= max_gap
    apart; runs with < min_anchors matches are noise and dropped."""
    km = _kmers(contig)
    idx = np.searchsorted(anchor_keys, km)
    idx = np.clip(idx, 0, len(anchor_keys) - 1)
    hit = anchor_keys[idx] == km
    pos = np.unique(anchor_pos[idx[hit]])
    if len(pos) == 0:
        return []
    brk = np.nonzero(np.diff(pos) > max_gap)[0]
    starts = np.concatenate([[0], brk + 1])
    ends = np.concatenate([brk, [len(pos) - 1]])
    out = []
    for s, e in zip(starts, ends):
        if e - s + 1 >= min_anchors:
            out.append((int(pos[s]), int(pos[e]) + K))
    return out


def _union_len(intervals: list[tuple[int, int]]) -> int:
    if not intervals:
        return 0
    iv = sorted(intervals)
    total, lo, hi = 0, iv[0][0], iv[0][1]
    for a, b in iv[1:]:
        if a > hi:
            total += hi - lo
            lo, hi = a, b
        else:
            hi = max(hi, b)
    return total + hi - lo


def _nx(lengths: list[int], denom: int, x: float = 0.5) -> int:
    """N50-style statistic: largest L such that contigs >= L sum to
    >= x * denom (0 when the assembly never reaches the threshold)."""
    acc = 0
    for ln in sorted(lengths, reverse=True):
        acc += ln
        if acc >= x * denom:
            return ln
    return 0


def evaluate_assembly(
    genome: np.ndarray, contigs: list[np.ndarray], max_gap: int = 1000
) -> dict:
    """Coverage + contiguity summary of a multi-contig assembly against
    the known genome. Returns {genome_len, assembly_len, genome_covered,
    genome_fraction, n50, ng50, per_contig: [{len, intervals, genome_span}]}."""
    keys, pos = _unique_anchors(genome)
    per = []
    all_iv = []
    for c in contigs:
        iv = contig_intervals(c, keys, pos, max_gap=max_gap)
        all_iv.extend(iv)
        per.append({
            "len": int(len(c)),
            "intervals": [[int(a), int(b)] for a, b in iv],
            "genome_span": int(sum(b - a for a, b in iv)),
        })
    covered = _union_len(all_iv)
    lens = [len(c) for c in contigs]
    return {
        "genome_len": int(len(genome)),
        "assembly_len": int(sum(lens)),
        "genome_covered": int(covered),
        "genome_fraction": round(covered / max(len(genome), 1), 4),
        "n50": _nx(lens, sum(lens)),
        "ng50": _nx(lens, len(genome)),
        "per_contig": per,
    }
