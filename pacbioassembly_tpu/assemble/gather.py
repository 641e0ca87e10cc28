"""Device-side candidate materialization.

The batch engine's screening phase needs (B, LA) reference windows and
(B, LB) read segments for the DP kernel. Packing those on the host
duplicates every window/segment into a dense batch and ships ~LA+LB bytes
per candidate over the (high-latency, tunneled) host->device link every
round. Instead, the read set is uploaded ONCE as a padded code matrix and
the current reference window once PER ROUND; per candidate only six int32
scalars cross the link, and the batch is materialized on device feeding
straight into the scorer.

Semantics mirror BatchAssembler._materialize exactly (same forward /
backward segment and window rules; reference get_accessor ref_seq.h:282-286
and the spaced_seed.cpp:424-426 trial layout):

  forward:  b[t] = codes[j + t]            (t < slen - j)
            a[u] = ref[p + u]              (u < min(ref_len, LA))
  backward: b[t] = codes[slen - 1 - j - t]
            a[u] = ref[p - u]

How it stays off the gather unit: spelling those rules as per-element
advanced indexing lowers to a real TPU gather — per-element addressing,
measured LINEAR in B*(LA+LB) and the dominant prefilter/full-screen prep
cost (benchmarks/prefilter_profile.py; ~87M elem/s on the r3 engine).
Instead, both sources are stored twice (forward AND reversed rows), which
turns every backward extraction into the same contiguous forward-window
rule on the reversed copy; each window is then (1) fetched as a handful of
128-byte-aligned blocks — a slice gather, 128x fewer descriptors — and
(2) re-based to its in-block offset with `_dyn_window`'s staged static
slices + masked selects (24 VPU ops, no per-element addressing at all).

All shapes are laddered (align/screen.ladder_size) so the jit compiles a
handful of variants per assembly run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..align.screen import ladder_size

_BLK = 128  # TPU lane quantum; all block fetches are 128-byte aligned


def _dyn_window(wide: jax.Array, off: jax.Array, width: int) -> jax.Array:
    """y[:, t] = wide[:, off + t] for t in [0, width), off in [0, 128).

    Per-row dynamic window extraction WITHOUT a per-element gather: stage 1
    selects among 16 static slices at multiples of 8, stage 2 among 8 unit
    slices — 24 slice+select VPU ops total, independent of B. Requires
    wide.shape[1] >= 127 + width (guaranteed by the caller's block count).
    """
    B, S = wide.shape
    assert S >= 127 + width, (S, width)
    w1 = width + 7
    hi = (off >> 3)[:, None]
    acc = jnp.zeros((B, w1), wide.dtype)
    for k in range(16):
        sl = jax.lax.slice_in_dim(wide, 8 * k, 8 * k + w1, axis=1)
        acc = jnp.where(hi == k, sl, acc)
    lo = (off & 7)[:, None]
    out = jnp.zeros((B, width), wide.dtype)
    for k in range(8):
        sl = jax.lax.slice_in_dim(acc, k, k + width, axis=1)
        out = jnp.where(lo == k, sl, out)
    return out


def _gather_blocks(flat: jax.Array, blk0: jax.Array, K: int) -> jax.Array:
    """(B, K*128) uint8: K consecutive 128-byte blocks per row starting at
    block index blk0, from flat (M, 128). A leading-axis slice gather —
    whole 128-lane rows, the layout XLA's TPU gather handles efficiently
    (vs per-element addressing). Out-of-range blocks clamp; callers mask."""
    idx = blk0[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, flat.shape[0] - 1)
    return flat[idx].reshape(idx.shape[0], K * _BLK)


def _nblocks(width: int) -> int:
    """Blocks covering a width-wide window at any in-block offset < 128:
    ceil((127 + width) / 128)."""
    return (width + 2 * _BLK - 2) // _BLK


def _gather_batch(
    ref_win: jax.Array,    # (2*Lrp,) uint8: window [pre,post) padded to Lrp, then its reverse
    wlen: jax.Array,       # () int32 real window length (post - pre)
    reads_mat: jax.Array,  # (2N, Lp) uint8: rows 0..N-1 forward codes, N..2N-1 reversed
    read_len: jax.Array,   # (N,) int32
    read_row: jax.Array,   # (B,) int32 row into reads_mat
    j: jax.Array,          # (B,) int32 trial offset
    fwd: jax.Array,        # (B,) bool
    prel: jax.Array,       # (B,) int32 window-relative ref position (p - pre)
    la: jax.Array,         # (B,) int32 = min(ref_len, LA), precomputed on host
    LA: int,
    LB: int,
):
    twoN, Lp = reads_mat.shape
    N = twoN // 2
    nb = Lp // _BLK
    Lrp = ref_win.shape[0] // 2

    slen = read_len[read_row]
    # clamp to the bucket: a no-op on full screening/traceback batches
    # (the caller's size bucket covers every real segment), but it lets the
    # prefilter pass (assemble/batch.py) score just the first LB bases of a
    # long segment as a genuine truncated alignment
    lb = jnp.minimum(slen - j, LB).astype(jnp.int32)

    # b: window [j, j+lb) of the forward row; for backward segments the
    # SAME rule on the reversed row (rev[j + t] = codes[slen - 1 - j - t])
    row = jnp.where(fwd, read_row, read_row + N)
    wide_b = _gather_blocks(
        reads_mat.reshape(twoN * nb, _BLK),
        (row * nb + (j >> 7)).astype(jnp.int32),
        _nblocks(LB),
    )
    b_full = _dyn_window(wide_b, (j & 127).astype(jnp.int32), LB)
    t = jnp.arange(LB, dtype=jnp.int32)[None, :]
    b = jnp.where(t < lb[:, None], b_full, jnp.uint8(0))

    # a: forward window [prel, prel+la) of the reference window; backward =
    # the same rule on the reversed half (rev[wlen-1-prel + u] = win[prel-u])
    astart = jnp.where(fwd, prel, Lrp + (wlen - 1 - prel)).astype(jnp.int32)
    wide_a = _gather_blocks(
        ref_win.reshape(-1, _BLK), astart >> 7, _nblocks(LA)
    )
    a_full = _dyn_window(wide_a, astart & 127, LA)
    u = jnp.arange(LA, dtype=jnp.int32)[None, :]
    a = jnp.where(u < la[:, None], a_full, jnp.uint8(0))

    return a, la.astype(jnp.int32), b, lb


_materialize_on_device = jax.jit(_gather_batch, static_argnames=("LA", "LB"))


@functools.partial(
    jax.jit, static_argnames=("LA", "LB", "w_max", "ratio", "backend")
)
def _mat_score(
    ref_win, wlen, reads_mat, read_len, read_row, j, fwd, prel, la,
    *, LA, LB, w_max, ratio, backend,
):
    """Fused materialize + score: ONE device dispatch and ONE packed
    (B, 4) int32 fetch [accept, matlen_a, dp_rows, matlen_b] per
    screening launch —
    on a high-latency link (the axon tunnel's 30-300 ms per call) the
    round-trip count, not the DP, bounds the steady-state round."""
    a, la2, b, lb = _gather_batch(
        ref_win, wlen, reads_mat, read_len, read_row, j, fwd, prel, la, LA, LB
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
    ref_win, wlen, reads_mat, read_len, read_row, j, fwd, prel, la,
    *, LA, LB, w_max, ratio, rows_max,
):
    """Fused materialize + align-with-traceback: one dispatch, two fetches
    (scalars packed (B, 4) int32; ops|vals packed (B, 2E) uint8)."""
    from ..align.traceback import batch_align_traceback

    a, la2, b, lb = _gather_batch(
        ref_win, wlen, reads_mat, read_len, read_row, j, fwd, prel, la, LA, LB
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
    ref_win, wlen, reads_mat, read_len, read_row, j, fwd, prel, la, ma, mb, acc,
    *, LA, LB, w_max, ratio, rows_max, e_max, interpret=False,
):
    """Fused materialize + Pallas parent emission + device walk: one
    dispatch, two fetches ((B, 2E) uint8 ops|vals and (B,) nedit). The goal
    cells (ma, mb, acc) come from the screening pass — bit-identical
    decisions, so no goal/threshold logic runs here (align/tbwave.py)."""
    from ..align.tbwave import batch_parents_pallas, walk_parents

    a, la2, b, lb = _gather_batch(
        ref_win, wlen, reads_mat, read_len, read_row, j, fwd, prel, la, LA, LB
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
    """Holds the device-resident read matrix (forward AND reversed rows —
    the reversal that makes backward extraction gather-free) and
    materializes screening batches on device. Falls back to None (caller
    uses the host path) when the dense matrices would be too large."""

    # dense (2N, Lp) uint8 budget for the device copy
    MAX_MATRIX_BYTES = 1 << 30

    def __init__(self, reads, cfg):
        lens = reads.lengths.astype(np.int64)
        n = len(lens)
        lmax = int(lens.max()) if n else 0
        lp = -(-max(lmax, 1) // _BLK) * _BLK
        self.ok = n > 0 and 2 * n * lp <= self.MAX_MATRIX_BYTES
        if not self.ok:
            return
        mat = np.zeros((2 * n, lp), dtype=np.uint8)
        for i in range(n):
            c = reads.codes(i)
            mat[i, : len(c)] = c
            mat[n + i, : len(c)] = c[::-1]
        self.reads_mat = jax.device_put(mat)
        self.read_len = jax.device_put(lens.astype(np.int32))
        self._win_cache = (None, None)  # (key, (device window, wlen))

    def window(self, ref):
        """Device copy of ref.buf[pre:post) (padded to the 8192 ladder)
        concatenated with its reverse, plus the real window length as a
        device scalar; uploaded once per reference mutation-version —
        i.e. once per round, since screening sees the round-start
        reference."""
        key = (id(ref), ref.version, ref.pre, ref.post)
        if self._win_cache[0] == key:
            return self._win_cache[1]
        win = ref.buf[ref.pre : ref.post]
        wlen = len(win)
        lrp = ladder_size(max(wlen, 1), 8192)
        arr = np.zeros(2 * lrp, dtype=np.uint8)
        arr[:wlen] = win
        arr[lrp : lrp + wlen] = win[::-1]
        pair = (jax.device_put(arr), jnp.int32(wlen))
        self._win_cache = (key, pair)
        return pair

    def materialize(self, ref, read_row, j, fwd, prel, la, LA, LB):
        """(a, la, b, lb) as device arrays; inputs are host int vectors
        already padded to the batch ladder (pad rows: la=lb=1 via j=slen-1,
        handled by the caller)."""
        dwin, wlen = self.window(ref)
        return _materialize_on_device(
            dwin,
            wlen,
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
        """Fused materialize+score; returns host (B, 4) int32
        [accept, matlen_a, dp_rows, matlen_b] — one dispatch, one fetch."""
        dwin, wlen = self.window(ref)
        packed = _mat_score(
            dwin, wlen, self.reads_mat, self.read_len,
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
        dwin, wlen = self.window(ref)
        ov, ne = _mat_parents(
            dwin, wlen, self.reads_mat, self.read_len,
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
        dwin, wlen = self.window(ref)
        scal, ov = _mat_traceback(
            dwin, wlen, self.reads_mat, self.read_len,
            jnp.asarray(read_row, dtype=jnp.int32),
            jnp.asarray(j, dtype=jnp.int32),
            jnp.asarray(fwd, dtype=bool),
            jnp.asarray(prel, dtype=jnp.int32),
            jnp.asarray(la, dtype=jnp.int32),
            LA=LA, LB=LB, w_max=w_max, ratio=ratio, rows_max=rows_max,
        )
        return np.asarray(scal), np.asarray(ov)
