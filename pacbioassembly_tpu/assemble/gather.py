"""Device-side candidate materialization.

The batch engine's screening phase needs (B, LA) reference windows and
(B, LB) read segments for the DP kernel. Packing those on the host
duplicates every window/segment into a dense batch and ships ~LA+LB bytes
per candidate over the (high-latency, tunneled) host->device link every
round. Instead, the read set is uploaded ONCE as a padded code matrix and
the current reference window once PER ROUND; per candidate only six int32
scalars cross the link, and the batch is materialized on device with
vectorized gathers feeding straight into the scorer.

Semantics mirror BatchAssembler._materialize exactly (same forward /
backward segment and window rules; reference get_accessor ref_seq.h:282-286
and the spaced_seed.cpp:424-426 trial layout):

  forward:  b[t] = codes[j + t]            (t < slen - j)
            a[u] = ref[p + u]              (u < min(ref_len, LA))
  backward: b[t] = codes[slen - 1 - j - t]
            a[u] = ref[p - u]

All shapes are laddered (align/screen.ladder_size) so the jit compiles a
handful of variants per assembly run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..align.screen import ladder_size


@functools.partial(jax.jit, static_argnames=("LA", "LB"))
def _materialize_on_device(
    ref_win: jax.Array,    # (Lr_pad,) uint8 reference window [pre, post), padded
    reads_mat: jax.Array,  # (N, Lmax) uint8 read codes, row i = read i
    read_len: jax.Array,   # (N,) int32
    read_row: jax.Array,   # (B,) int32 row into reads_mat
    j: jax.Array,          # (B,) int32 trial offset
    fwd: jax.Array,        # (B,) bool
    prel: jax.Array,       # (B,) int32 window-relative ref position (p - pre)
    la: jax.Array,         # (B,) int32 = min(ref_len, LA), precomputed on host
    LA: int,
    LB: int,
):
    Lr = ref_win.shape[0]
    Lm = reads_mat.shape[1]

    slen = read_len[read_row]
    lb = (slen - j).astype(jnp.int32)

    t = jnp.arange(LB, dtype=jnp.int32)[None, :]
    bidx = jnp.where(fwd[:, None], j[:, None] + t, slen[:, None] - 1 - j[:, None] - t)
    valid_b = t < lb[:, None]
    b = jnp.where(
        valid_b,
        reads_mat[read_row[:, None], jnp.clip(bidx, 0, Lm - 1)],
        jnp.uint8(0),
    )

    u = jnp.arange(LA, dtype=jnp.int32)[None, :]
    aidx = jnp.where(fwd[:, None], prel[:, None] + u, prel[:, None] - u)
    valid_a = u < la[:, None]
    a = jnp.where(valid_a, ref_win[jnp.clip(aidx, 0, Lr - 1)], jnp.uint8(0))

    return a, la.astype(jnp.int32), b, lb


class DeviceBatchBuilder:
    """Holds the device-resident read matrix and materializes screening
    batches on device. Falls back to None (caller uses the host path) when
    the dense read matrix would be too large."""

    # dense (N, Lmax) uint8 budget for the device copy
    MAX_MATRIX_BYTES = 1 << 30

    def __init__(self, reads, cfg):
        lens = reads.lengths.astype(np.int64)
        n = len(lens)
        lmax = int(lens.max()) if n else 0
        self.ok = n > 0 and n * lmax <= self.MAX_MATRIX_BYTES
        if not self.ok:
            return
        mat = np.zeros((n, lmax), dtype=np.uint8)
        for i in range(n):
            c = reads.codes(i)
            mat[i, : len(c)] = c
        self.reads_mat = jax.device_put(mat)
        self.read_len = jax.device_put(lens.astype(np.int32))
        self._win_cache = (None, None)  # (key, device window)

    def window(self, ref):
        """Device copy of ref.buf[pre:post), laddered; uploaded once per
        reference mutation-version — i.e. once per round, since screening
        sees the round-start reference."""
        key = (id(ref), ref.version, ref.pre, ref.post)
        if self._win_cache[0] == key:
            return self._win_cache[1]
        win = ref.buf[ref.pre : ref.post]
        pad = ladder_size(max(len(win), 1), 8192) - len(win)
        if pad:
            win = np.pad(win, (0, pad))
        dwin = jax.device_put(win)
        self._win_cache = (key, dwin)
        return dwin

    def materialize(self, ref, read_row, j, fwd, prel, la, LA, LB):
        """(a, la, b, lb) as device arrays; inputs are host int vectors
        already padded to the batch ladder (pad rows: la=lb=1 via j=slen-1,
        handled by the caller)."""
        return _materialize_on_device(
            self.window(ref),
            self.reads_mat,
            self.read_len,
            jnp.asarray(read_row, dtype=jnp.int32),
            jnp.asarray(j, dtype=jnp.int32),
            jnp.asarray(fwd, dtype=bool),
            jnp.asarray(prel, dtype=jnp.int32),
            jnp.asarray(la, dtype=jnp.int32),
            LA=LA,
            LB=LB,
        )
