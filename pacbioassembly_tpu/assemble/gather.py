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


def _gather_batch(
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
    # clamp to the bucket: a no-op on full screening/traceback batches
    # (the caller's size bucket covers every real segment), but it lets the
    # prefilter pass (assemble/batch.py) score just the first LB bases of a
    # long segment as a genuine truncated alignment
    lb = jnp.minimum(slen - j, LB).astype(jnp.int32)

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


_materialize_on_device = jax.jit(_gather_batch, static_argnames=("LA", "LB"))


@functools.partial(
    jax.jit, static_argnames=("LA", "LB", "w_max", "ratio", "backend")
)
def _mat_score(
    ref_win, reads_mat, read_len, read_row, j, fwd, prel, la,
    *, LA, LB, w_max, ratio, backend,
):
    """Fused materialize + score: ONE device dispatch and ONE packed
    (B, 3) int32 fetch [accept, matlen_a, dp_rows] per screening launch —
    on a high-latency link (the axon tunnel's 30-300 ms per call) the
    round-trip count, not the DP, bounds the steady-state round."""
    a, la2, b, lb = _gather_batch(
        ref_win, reads_mat, read_len, read_row, j, fwd, prel, la, LA, LB
    )
    if backend == "bitpallas":
        from ..align.bitwave import batch_score_bitpallas

        res = batch_score_bitpallas(a, la2, b, lb, la_max=LA, w_max=w_max, ratio=ratio)
    elif backend == "pallas":
        from ..align.wavefront import batch_score_pallas

        res = batch_score_pallas(a, la2, b, lb, la_max=LA, w_max=w_max, ratio=ratio)
    else:
        from ..align.scan import batch_score

        res = batch_score(a, la2, b, lb, la_max=LA, w_max=w_max, ratio=ratio)
    return jnp.stack(
        [res.accept.astype(jnp.int32), res.matlen_a, res.dp_rows, res.matlen_b],
        axis=1,
    )


@functools.partial(
    jax.jit, static_argnames=("LA", "LB", "w_max", "ratio", "rows_max")
)
def _mat_traceback(
    ref_win, reads_mat, read_len, read_row, j, fwd, prel, la,
    *, LA, LB, w_max, ratio, rows_max,
):
    """Fused materialize + align-with-traceback: one dispatch, two fetches
    (scalars packed (B, 4) int32; ops|vals packed (B, 2E) uint8)."""
    from ..align.traceback import batch_align_traceback

    a, la2, b, lb = _gather_batch(
        ref_win, reads_mat, read_len, read_row, j, fwd, prel, la, LA, LB
    )
    res = batch_align_traceback(
        a, la2, b, lb, la_max=LA, w_max=w_max, ratio=ratio, rows_max=rows_max
    )
    scal = jnp.stack(
        [
            res.scores.accept.astype(jnp.int32),
            res.scores.matlen_a,
            res.scores.matlen_b,
            res.nedit,
        ],
        axis=1,
    )
    return scal, jnp.concatenate([res.ops, res.vals], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("LA", "LB", "w_max", "ratio", "rows_max", "e_max", "interpret"),
)
def _mat_parents(
    ref_win, reads_mat, read_len, read_row, j, fwd, prel, la, ma, mb, acc,
    *, LA, LB, w_max, ratio, rows_max, e_max, interpret=False,
):
    """Fused materialize + Pallas parent emission + device walk: one
    dispatch, two fetches ((B, 2E) uint8 ops|vals and (B,) nedit). The goal
    cells (ma, mb, acc) come from the screening pass — bit-identical
    decisions, so no goal/threshold logic runs here (align/tbwave.py)."""
    from ..align.tbwave import batch_parents_pallas, walk_parents

    a, la2, b, lb = _gather_batch(
        ref_win, reads_mat, read_len, read_row, j, fwd, prel, la, LA, LB
    )
    parents, md, lb_dp = batch_parents_pallas(
        a, la2, b, lb, la_max=LA, w_max=w_max, ratio=ratio, rows_max=rows_max,
        interpret=interpret,
    )
    ops, vals, nedit = walk_parents(
        parents, b, lb_dp, md, ma, mb, acc, w_max=w_max, e_max=e_max
    )
    return jnp.concatenate([ops, vals], axis=1), nedit


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

    def score(self, ref, read_row, j, fwd, prel, la, *, LA, LB, w_max, ratio, backend):
        """Fused materialize+score; returns host (B, 3) int32
        [accept, matlen_a, dp_rows] — one dispatch, one fetch."""
        packed = _mat_score(
            self.window(ref), self.reads_mat, self.read_len,
            jnp.asarray(read_row, dtype=jnp.int32),
            jnp.asarray(j, dtype=jnp.int32),
            jnp.asarray(fwd, dtype=bool),
            jnp.asarray(prel, dtype=jnp.int32),
            jnp.asarray(la, dtype=jnp.int32),
            LA=LA, LB=LB, w_max=w_max, ratio=ratio, backend=backend,
        )
        return np.asarray(packed)

    def traceback_parents(
        self, ref, read_row, j, fwd, prel, la, ma, mb, acc,
        *, LA, LB, w_max, ratio, rows_max, e_max, interpret=False,
    ):
        """Fused materialize + Pallas parent kernel + walk; returns host
        ((B, 2E) uint8 ops|vals, (B,) int32 nedit)."""
        ov, ne = _mat_parents(
            self.window(ref), self.reads_mat, self.read_len,
            jnp.asarray(read_row, dtype=jnp.int32),
            jnp.asarray(j, dtype=jnp.int32),
            jnp.asarray(fwd, dtype=bool),
            jnp.asarray(prel, dtype=jnp.int32),
            jnp.asarray(la, dtype=jnp.int32),
            jnp.asarray(ma, dtype=jnp.int32),
            jnp.asarray(mb, dtype=jnp.int32),
            jnp.asarray(acc, dtype=bool),
            LA=LA, LB=LB, w_max=w_max, ratio=ratio,
            rows_max=rows_max, e_max=e_max, interpret=interpret,
        )
        return np.asarray(ov), np.asarray(ne)

    def traceback(self, ref, read_row, j, fwd, prel, la, *, LA, LB, w_max, ratio, rows_max):
        """Fused materialize+traceback; returns host ((B, 4) int32
        [accept, matlen_a, matlen_b, nedit], (B, 2E) uint8 ops|vals)."""
        scal, ov = _mat_traceback(
            self.window(ref), self.reads_mat, self.read_len,
            jnp.asarray(read_row, dtype=jnp.int32),
            jnp.asarray(j, dtype=jnp.int32),
            jnp.asarray(fwd, dtype=bool),
            jnp.asarray(prel, dtype=jnp.int32),
            jnp.asarray(la, dtype=jnp.int32),
            LA=LA, LB=LB, w_max=w_max, ratio=ratio, rows_max=rows_max,
        )
        return np.asarray(scal), np.asarray(ov)
