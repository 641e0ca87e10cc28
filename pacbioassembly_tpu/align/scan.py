"""Batched banded edit-distance scorer in pure JAX (lax.scan).

This is the device-side screening kernel in XLA form: B alignments with
shared static geometry (row bound LA, band half-width W) are scored in one
jit-compiled program — no traceback, just {accept, cost, matlen_a,
matlen_b, diag_cost}. The Pallas kernel (wavefront.py) implements the same
recurrence closer to the metal; this version is the CPU-testable exact
reference for it and the fallback path.

Parity notes (vs reference seq_aligner.h:92-213):
  * identical band geometry, tie-breaking, early failure, and goal-cell
    selection as align/banded.py;
  * all threshold comparisons (early failure `cost(i,i) > i*R`, acceptance
    `matlen_b >= len_b*(1-R)`, band `max_dst = 1+floor(len*R)`) are done
    with integer tables precomputed on host in float64, so results are
    bit-identical to the C++ doubles with no float32 drift on device;
  * per-pair dynamic lengths/bands are masked inside the static (LA, S)
    stripe; stripe center is the static W, cell (i,j) lives at k = j-i+W.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Constants

INF = np.int32(1 << 28)


class BatchScores(NamedTuple):
    accept: jax.Array    # (B,) bool — alignment succeeded (pre-OVERLAP_MIN)
    cost: jax.Array      # (B,) int32 final cost (valid when accept)
    matlen_a: jax.Array  # (B,) int32
    matlen_b: jax.Array  # (B,) int32
    diag_cost: jax.Array  # (B,) int32; -1 when len_a > len_b
    dp_rows: jax.Array   # (B,) int32 — rows actually computed (perf metric)


def _threshold_tables(ratio: float, max_len: int):
    """Integer decision tables computed in float64 on host.

    early_thr[i]  = floor(i * ratio): integer cost fails iff cost > early_thr
    accept_min[l] = ceil(l * (1 - ratio)): integer matlen_b accepted iff
                    matlen_b >= accept_min  (m < x  <=>  m < ceil(x))
    band_tab[l]   = 1 + floor(l * ratio)  (max_dst)
    """
    i = np.arange(max_len + 1, dtype=np.float64)
    early_thr = np.floor(i * ratio).astype(np.int32)
    accept_min = np.ceil(i * (1.0 - ratio)).astype(np.int32)
    band_tab = (1 + np.floor(i * ratio)).astype(np.int32)
    return early_thr, accept_min, band_tab


def static_shift_edge(x: jax.Array, shift: int, width: int) -> jax.Array:
    """y[:, t] = x[:, clip(t - shift, 0, x.shape[1]-1)] for t in [0, width).

    The kernels' XLA prep needs b/kb re-based to window coordinates — a
    shift by a STATIC amount with edge clamping. Spelling it as
    take_along_axis(clip(iota - shift)) lowers to a real TPU gather
    (per-element addressing, slow and linear in B*width); the identical
    values are edge-mode padding plus a slice, which XLA emits as
    broadcast+concat data movement. Callers mask the clamped regions.
    """
    assert shift >= 0, shift
    Lx = x.shape[1]
    assert Lx >= 1, "edge-mode pad needs a nonempty axis-1"
    y = jnp.pad(x, ((0, 0), (shift, max(0, width - Lx - shift))), mode="edge")
    return y[:, :width]


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "w_max", "ratio", "maxn", "maxm"),
)
def batch_score(
    a: jax.Array,   # (B, LA) uint8/int32 codes of sequence a, padded
    la: jax.Array,  # (B,) int32 raw lengths of a
    b: jax.Array,   # (B, LB) codes of sequence b, padded
    lb: jax.Array,  # (B,) int32 raw lengths of b
    *,
    la_max: int,
    w_max: int,
    ratio: float = Constants.MAXR,
    maxn: int = Constants.ALIGNER_MAXN,
    maxm: int = Constants.ALIGNER_MAXM,
) -> BatchScores:
    """Score B banded alignments. la_max bounds computed rows; w_max bounds
    every pair's max_dst (pairs exceeding it are rejected, mirroring the
    reference's MAXM rejection)."""
    S = 2 * w_max + 1
    LB = b.shape[1]
    tab_len = max(la_max, LB, a.shape[1]) + 1
    early_thr_np, accept_min_np, band_tab_np = _threshold_tables(ratio, tab_len)
    early_thr = jnp.asarray(early_thr_np)
    accept_min = jnp.asarray(accept_min_np)
    band_tab = jnp.asarray(band_tab_np)

    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    la = la.astype(jnp.int32)
    lb = lb.astype(jnp.int32)

    k_idx = jnp.arange(S, dtype=jnp.int32)

    def one(a_row, la_i, b_row, lb_i):
        cond = lb_i >= la_i
        min_len = jnp.where(cond, la_i, lb_i)
        md = band_tab[min_len]
        len_a = jnp.where(cond, la_i, jnp.minimum(la_i, lb_i + md))
        len_b = jnp.where(cond, jnp.minimum(lb_i, la_i + md), lb_i)
        ok_size = (len_a < maxn + maxm) & (md < maxm) & (md <= w_max) & (len_a <= la_max)

        W = w_max
        j0 = k_idx - W
        prev0 = jnp.where(
            (j0 >= 0) & (j0 <= jnp.minimum(len_b, md)), j0, INF
        ).astype(jnp.int32)
        # derive the other carry inits from a (possibly device-varying)
        # input so shard_map's varying-axis tracking accepts the scan
        failed0 = la_i < 0  # always False
        final_row0 = jnp.full(S, INF, jnp.int32) + la_i * 0
        fail_i0 = jnp.int32(0) + la_i * 0  # first early-failure row (0 = none)

        def row(carry, i):
            prev, failed, final_row, fail_i = carry
            active = i <= len_a
            j = k_idx + (i - W)
            in_band = jnp.abs(k_idx - W) <= md
            validj = (j >= 1) & (j <= len_b) & in_band & active
            bj = b_row[jnp.clip(j - 1, 0, LB - 1)]
            ai = a_row[i - 1]
            mismatch = (bj != ai).astype(jnp.int32)
            diag = jnp.where(validj, prev + mismatch, INF)
            up = jnp.where(validj, jnp.roll(prev, -1).at[-1].set(INF) + 1, INF)
            D = jnp.minimum(diag, up)
            border = (j == 0) & (i <= md) & active
            D = jnp.where(border, i, D)
            r = k_idx + jax.lax.cummin(D - k_idx)
            cur = jnp.where(validj | border, r, INF).astype(jnp.int32)

            fail_now = (
                active
                & (i > 10)
                & (i <= len_b)
                & (cur[W] > early_thr[jnp.minimum(i, tab_len)])
            )
            fail_i = jnp.where(fail_now & ~failed, i, fail_i)
            failed = failed | fail_now
            final_row = jnp.where(i == len_a, cur, final_row)

            k_col = len_b - i + W
            col_ok = (k_col >= 0) & (k_col < S) & active
            col_cost = jnp.where(col_ok, cur[jnp.clip(k_col, 0, S - 1)], INF)

            prev = jnp.where(active, cur, prev)
            return (prev, failed, final_row, fail_i), col_cost

        (prev, failed, final_row, fail_i), col_list = jax.lax.scan(
            row,
            (prev0, failed0, final_row0, fail_i0),
            jnp.arange(1, la_max + 1, dtype=jnp.int32),
        )

        col0 = jnp.where(len_b <= md, len_b, INF).astype(jnp.int32)
        cols = jnp.concatenate([col0[None], col_list])  # index by i = 0..la_max

        # goal_cell
        long = len_a > len_b
        ii = jnp.arange(la_max + 1, dtype=jnp.int32)
        colm = jnp.where((ii >= len_b) & (ii <= len_a), cols, INF)
        iL = jnp.argmin(colm).astype(jnp.int32)
        costL = colm[iL]

        rowm = jnp.where(
            (k_idx >= W) & (k_idx <= W + (len_b - len_a)), final_row, INF
        )
        kS = jnp.argmin(rowm).astype(jnp.int32)
        costS = rowm[kS]
        mbS = len_a + (kS - W)

        matlen_a = jnp.where(long, iL, len_a)
        matlen_b = jnp.where(long, len_b, mbS)
        cost = jnp.where(long, costL, costS)
        accept = (
            ok_size
            & ~failed
            & (matlen_b >= accept_min[jnp.clip(len_b, 0, tab_len)])
            & (cost < INF)
        )
        diag_cost = jnp.where(len_a <= len_b, final_row[W], -1)
        # reference-equivalent rows: the serial DP aborts at the early-
        # failure row (seq_aligner.h:185-187), so count rows only up to it
        rows = jnp.where(ok_size, jnp.where(failed, fail_i, len_a), 0)
        return accept, cost, matlen_a, matlen_b, diag_cost, rows

    accept, cost, ma, mb, dc, rows = jax.vmap(one)(a, la, b, lb)
    return BatchScores(accept, cost, ma, mb, dc, rows)
