"""Device (jit/XLA) form of the consensus commit pass.

`ref_seq::evolve` (ref_seq.h:317-349) as one jitted tensor program over the
(L, 4) vote tensors: split supplements into new boxes, keep majority
winners, delete the rest absorbing their selection into the nearest
preceding survivor's supplement — the same interleave/mask/compact scheme
as the numpy ConsensusRef.evolve (consensus/state.py), which remains the
production path (an O(L) host pass is cheap at L <= 800k and the result
must feed the host-side text buffer anyway). Differential equality with
the numpy pass is pinned by tests/test_consensus.py.

Threshold semantics: the reference compares `max_vote > ratio * total` in
double precision (ref_seq.h:170-175). Rather than trusting float32 on
device, the caller precomputes `floor64(ratio * total)` per box on host
(vectorized, O(L)) and the device compares integers:
max > ratio*total  <=>  max >= floor(ratio*total) + 1  for integer max.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class EvolveResult(NamedTuple):
    codes: jax.Array   # (2L,) uint8 — surviving box winners, compacted front
    sel: jax.Array     # (2L, 4) int32
    sup: jax.Array     # (2L, 4) int32
    total: jax.Array   # (2L,) int32
    new_len: jax.Array  # () int32 — number of surviving boxes


@jax.jit
def device_evolve(
    sel: jax.Array,        # (L, 4) int32 selection votes
    sup: jax.Array,        # (L, 4) int32 supplement (insert-after) votes
    total: jax.Array,      # (L,) int32 participant counts
    thresh_floor: jax.Array,  # (L,) int32 = floor64(vote_ratio * total)
    live: jax.Array,       # (L,) bool — rows beyond the real window are False
) -> EvolveResult:
    L = sel.shape[0]
    sel_max = sel.max(axis=1)
    sup_max = sup.max(axis=1)
    valid = (sel_max >= thresh_floor + 1) & live   # is_valid  (ref_seq.h:170)
    has_sup = (sup_max >= thresh_floor + 1) & live  # has_supply (ref_seq.h:175)
    # winner(): argmax with A>C>G>T tie preference == first max
    sel_win = sel.argmax(axis=1).astype(jnp.uint8)
    sup_win = sup.argmax(axis=1).astype(jnp.uint8)

    # candidate slots: 2i = original box i (kept iff valid), 2i+1 = its
    # split box (exists iff has_sup; split copies total, resets sup)
    K = jnp.zeros(2 * L, bool).at[0::2].set(valid).at[1::2].set(has_sup)
    cand_sel = jnp.zeros((2 * L, 4), jnp.int32).at[0::2].set(sel).at[1::2].set(sup)
    cand_sup = (
        jnp.zeros((2 * L, 4), jnp.int32)
        .at[0::2]
        .set(jnp.where(has_sup[:, None], 0, sup))
    )
    cand_tot = jnp.zeros(2 * L, jnp.int32).at[0::2].set(total).at[1::2].set(total)
    cand_code = jnp.zeros(2 * L, jnp.uint8).at[0::2].set(sel_win).at[1::2].set(sup_win)

    # deleted boxes absorb their selection into the nearest preceding kept
    # candidate's supplement (ref_seq.h:339-346)
    slot_of_kept = jnp.where(K, jnp.arange(2 * L, dtype=jnp.int32), -1)
    last_kept = jax.lax.cummax(slot_of_kept)
    last_kept_before = jnp.concatenate(
        [jnp.full(1, -1, jnp.int32), last_kept[:-1]]
    )
    deleted = ~valid & live
    tgt = last_kept_before[0::2]  # target slot for box i's absorbed votes
    absorb_ok = deleted & (tgt >= 0)
    add = jnp.where(absorb_ok[:, None], sel, 0)
    cand_sup = cand_sup.at[jnp.clip(tgt, 0, 2 * L - 1)].add(add)

    # stable compaction: kept slots to the front in order
    order = jnp.argsort(jnp.where(K, 0, 1), stable=True)
    return EvolveResult(
        codes=cand_code[order],
        sel=cand_sel[order],
        sup=cand_sup[order],
        total=cand_tot[order],
        new_len=K.sum().astype(jnp.int32),
    )


@functools.lru_cache(maxsize=None)
def _pad_ladder(n: int, quantum: int = 8192) -> int:
    from ..align.screen import ladder_size

    return ladder_size(n, quantum)


def evolve_on_device(ref) -> None:
    """Run ConsensusRef.evolve's commit through the device pass and write
    the result back into the host state — same window/geometry updates as
    the numpy evolve (state.py). Bit-equal by the differential test."""
    if ref.locked:
        return
    pre, post = ref.pre, ref.post
    L = post - pre
    ref.version += 1
    if L == 0:
        ref.beg = ref.end = ref.pre = ref.post = ref.origin
        return
    Lp = _pad_ladder(L)
    sel = np.zeros((Lp, 4), np.int32)
    sup = np.zeros((Lp, 4), np.int32)
    tot = np.zeros(Lp, np.int32)
    live = np.zeros(Lp, bool)
    sel[:L] = ref.sel[pre:post]
    sup[:L] = ref.sup[pre:post]
    tot[:L] = ref.total[pre:post]
    live[:L] = True
    # float64 threshold on host (the reference compares C doubles)
    thresh_floor = np.floor(ref.vote_ratio * tot.astype(np.float64)).astype(np.int32)

    res = device_evolve(sel, sup, tot, thresh_floor, live)
    newL = int(res.new_len)
    o = ref.origin
    if o + newL > ref.cap:
        raise OverflowError("reference capacity exceeded (evolve)")
    ref.buf[o : o + newL] = np.asarray(res.codes)[:newL]
    ref.sel[o : o + newL] = np.asarray(res.sel)[:newL]
    ref.sup[o : o + newL] = np.asarray(res.sup)[:newL]
    ref.total[o : o + newL] = np.asarray(res.total)[:newL]
    ref.pre = ref.beg = o
    ref.end = ref.post = o + newL
    # this path doesn't track absorb receivers; next host evolve runs full
    ref._dirty = None
