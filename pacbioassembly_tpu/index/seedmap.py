"""Spaced-seed index of the reference boundaries.

TPU-idiomatic replacement for the reference's
hash_map<unsigned, list<int>> seedmap (common.h:54, ref_seq.h:291-311):
masked 16-mer keys of the boundary windows are sorted once into a CSR
table (keys_sorted, positions_sorted) and looked up with binary search —
branch-free, vectorizable, and shippable to the device as two flat arrays.

Window semantics match get_seedmap exactly:
  * head: first min(len-16, MAX_READ_LEN) positions, ascending
  * tail: last min(len-MAX_READ_LEN-16, MAX_READ_LEN) positions, descending
    from len-16
  * skip keys whose masked value is 0 (poly-A filter)
  * within a bucket, candidate order == insertion order (head ascending,
    then tail descending) — preserved here by a stable sort so that the
    sequential engine probes candidates in reference order.
"""

from __future__ import annotations

import numpy as np

from ..codec.dna import SEED_LEN, encode_seeds
from ..config import Constants


class SeedIndex:
    __slots__ = ("keys", "positions", "n_entries", "n_keys")

    def __init__(self, keys_sorted: np.ndarray, positions_sorted: np.ndarray):
        self.keys = keys_sorted            # uint32, ascending (stable within key)
        self.positions = positions_sorted  # int32 reference positions
        self.n_entries = len(keys_sorted)
        self.n_keys = int(len(np.unique(keys_sorted)))

    def lookup(self, key: int) -> np.ndarray:
        """Positions for one masked seed, in reference insertion order."""
        lo = np.searchsorted(self.keys, np.uint32(key), side="left")
        hi = np.searchsorted(self.keys, np.uint32(key), side="right")
        return self.positions[lo:hi]

    def lookup_batch(self, queries: np.ndarray):
        """(starts, counts) for a batch of masked seeds."""
        q = np.asarray(queries, dtype=np.uint32)
        lo = np.searchsorted(self.keys, q, side="left")
        hi = np.searchsorted(self.keys, q, side="right")
        return lo, hi - lo


def build_seedmap(
    codes: np.ndarray,
    mask: int,
    max_read_len: int = Constants.MAX_READ_LEN,
) -> tuple[SeedIndex, int]:
    """Build the boundary seed index of a reference window.

    Returns (index, n_indexed) where n_indexed mirrors the reference's
    get_seedmap return value nhead + max(ntail, 0) (ref_seq.h:291-311).
    """
    L = len(codes)
    nmax = L - SEED_LEN
    nhead = min(nmax, max_read_len)
    head_pos = np.arange(max(0, nhead), dtype=np.int64)
    ntail = min(L - max_read_len - SEED_LEN, max_read_len)
    tail_pos = L - SEED_LEN - np.arange(max(0, ntail), dtype=np.int64)
    positions = np.concatenate([head_pos, tail_pos])

    if len(positions) == 0:
        idx = SeedIndex(np.empty(0, np.uint32), np.empty(0, np.int32))
        return idx, max(0, nhead) + max(0, ntail)

    seeds = encode_seeds(codes, positions) & np.uint32(mask)
    keep = seeds != 0
    seeds = seeds[keep]
    positions = positions[keep]

    order = np.argsort(seeds, kind="stable")
    idx = SeedIndex(seeds[order], positions[order].astype(np.int32))
    return idx, max(0, nhead) + max(0, ntail)
