"""Device-side spaced-seed index (jit/XLA).

The host CSR table (seedmap.py) has a device twin so that candidate
discovery can run on-chip at scale: seeds of every boundary window are
computed with vectorized shifts, masked, sorted on device, and queries are
answered with a vectorized binary search (jnp.searchsorted lowers to an
XLA while-of-compares — per-lane dynamic gather in a hand-written Pallas
kernel would be slower on the VPU, which has no scatter/gather unit).

Equivalence with the host index is pinned by tests/test_device_index.py;
candidate order inside a bucket matches the host's insertion-order CSR via
the same stable sort key.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.dna import SEED_LEN, SEED_SHIFTS
from ..config import Constants


class DeviceSeedIndex(NamedTuple):
    keys: jax.Array       # (N,) uint32 sorted (stable within key); pad = 0
    positions: jax.Array  # (N,) int32
    n_entries: jax.Array  # () int32 — live entries (pads sort first as key 0)


def device_seeds(codes: jax.Array, positions: jax.Array) -> jax.Array:
    """uint32 seeds of 16-mers at `positions` (vectorized gather+shift)."""
    shifts = jnp.asarray(SEED_SHIFTS.astype(np.uint32))
    idx = positions[:, None] + jnp.arange(SEED_LEN, dtype=jnp.int32)[None, :]
    window = codes[jnp.clip(idx, 0, codes.shape[0] - 1)].astype(jnp.uint32)
    return (window << shifts[None, :]).sum(axis=1, dtype=jnp.uint32)


def device_build_seedmap(
    codes: jax.Array,
    length: jax.Array,
    mask,
    max_read_len: int = Constants.MAX_READ_LEN,
) -> DeviceSeedIndex:
    """Wrapper coercing the mask (a Python int up to 2**32-1 would overflow
    int32 tracing) before entering the jitted builder."""
    return _device_build_seedmap(
        codes, length, np.uint32(mask), max_read_len=max_read_len
    )


@functools.partial(jax.jit, static_argnames=("max_read_len",))
def _device_build_seedmap(
    codes: jax.Array,
    length: jax.Array,
    mask,
    max_read_len: int = Constants.MAX_READ_LEN,
) -> DeviceSeedIndex:
    """Boundary seed index of a (padded) reference window on device.

    codes: (L_pad,) uint8 reference codes, valid prefix `length`.
    Window semantics match ref_seq::get_seedmap (head asc + tail desc,
    poly-A skip); padded/invalid slots get key 0xFFFFFFFF and sort last.
    """
    L_pad = codes.shape[0]
    cap = min(L_pad, max_read_len)
    mask = jnp.asarray(mask, dtype=jnp.uint32)

    nmax = length - SEED_LEN
    nhead = jnp.minimum(nmax, max_read_len)
    head_pos = jnp.arange(cap, dtype=jnp.int32)
    head_valid = head_pos < nhead

    ntail = jnp.minimum(length - max_read_len - SEED_LEN, max_read_len)
    t = jnp.arange(cap, dtype=jnp.int32)
    tail_pos = length - SEED_LEN - t
    tail_valid = t < ntail

    positions = jnp.concatenate([head_pos, tail_pos])
    valid = jnp.concatenate([head_valid, tail_valid]) & (positions >= 0)

    seeds = device_seeds(codes, positions) & mask
    live = valid & (seeds != 0)
    # live keys are never 0 (the poly-A skip), so 0 is a safe padding
    # sentinel that sorts first and cannot collide with a genuine key
    keys = jnp.where(live, seeds, jnp.uint32(0))

    # stable sort by key preserves insertion (head-then-tail) bucket order
    order = jnp.argsort(keys, stable=True)
    return DeviceSeedIndex(
        keys=keys[order],
        positions=positions[order].astype(jnp.int32),
        n_entries=live.sum().astype(jnp.int32),
    )


@jax.jit
def device_lookup(index: DeviceSeedIndex, queries: jax.Array):
    """(starts, counts) for a batch of masked uint32 queries."""
    q = queries.astype(jnp.uint32)
    lo = jnp.searchsorted(index.keys, q, side="left")
    hi = jnp.searchsorted(index.keys, q, side="right")
    cnt = jnp.where(q == 0, 0, hi - lo)  # key 0 is padding (host bucket empty)
    return lo.astype(jnp.int32), cnt.astype(jnp.int32)
