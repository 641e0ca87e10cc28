"""Pallas TPU kernel for batched banded edit-distance screening.

The hot loop of the whole engine (reference seq_aligner.h:151-190 is the
serial analogue; SURVEY.md §6's north-star metric is banded-DP cell
updates/s/chip). Design:

  * one grid program scores 8 alignments (int32 costs) — one per sublane;
    the band stripe lives across lanes: cell (i, j) of pair m sits at
    [m, k = j - i + W] of a (sublanes, S) VMEM vector, S = 2*w_max+1
    rounded up to a lane multiple;
  * rows advance sequentially (i = 1..la_max); everything within a row is
    a VPU vector op across the whole band — the DELETE source is a lane
    roll of the previous row, the MATCH source is the previous row in
    place;
  * per-row inputs (the a character, the shifted b window, the
    early-failure threshold) are served from small VMEM windows that are
    refreshed every 128 rows with lane-aligned dynamic slices and rotated
    into place with tpu dynamic rotates — Mosaic only allows dynamic lane
    slices at multiples of 128;
  * the in-row INSERT chain r[k] = min(D[k], r[k-1]+1) is resolved exactly
    in log2(S) shift-min steps (min-plus prefix scan by doubling);
  * goal-cell tracking (far-column running argmin + far-row argmin with
    first-minimum tie-break), early failure, and size rejection all run
    in-kernel; a while_loop exits as soon as every pair in the program is
    finished (early-failed / size-rejected / past its last row) — the
    batch analogue of the reference's early abort; callers sort candidates
    by length so groups finish together;
  * 5 scalars per alignment leave the chip.

Costs are int32-only: an int16 mode (16 pairs/sublane group) was built and
measured in r1/r2 but v5e hardware has no 16-bit vector comparisons at all
("Target does not support this comparison" — interpret-only), so the
plumbing was removed in r3; see git history if a future TPU generation
gains 16-bit compares.

Parity: bit-identical decisions with align/scan.py and align/banded.py —
every threshold comparison uses integer tables precomputed on host in
float64 (scan._threshold_tables), so there is no float drift on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Constants
from .scan import BatchScores, _threshold_tables, static_shift_edge

INF32 = np.int32(1 << 28)
CHUNK = 128  # lane-alignment quantum for dynamic slices


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_pick(vec, lane, idx, big):
    """Value at lane `idx` (traced) of each int32 sublane row, as (rows, 1)."""
    return jnp.min(jnp.where(lane == idx, vec, big), axis=1, keepdims=True)


def _kernel(
    tab_ref,      # (1, T) int32 early-failure thresholds floor(i*R)
    a_ref,        # (SL, LA_pad) int32 codes of a
    bext_ref,     # (SL, EXT) int32 pre-shifted b codes (-1 sentinel)
    md_ref,       # (SL, 1) int32 per-pair max_dst
    lena_ref,     # (SL, 1) int32
    lenb_ref,     # (SL, 1) int32
    oksz_ref,     # (SL, 1) int32 size-accept flag
    out_ref,      # (SL, 128) int32: lanes 0..4 = accept, cost, ma, mb, diag
    prev_ref,     # scratch (SL, S) int32
    final_ref,    # scratch (SL, S) int32
    awin_ref,     # scratch (SL, CHUNK) int32 (dynamic rotates are int32-only)
    bwin_ref,     # scratch (SL, S + CHUNK) int32
    twin_ref,     # scratch (1, 2 * CHUNK) int32
    *,
    la_max: int,
    w_max: int,
    s_pad: int,
    sublanes: int,
):
    S = s_pad
    SW = S + CHUNK
    W = w_max
    SL = sublanes
    INF = jnp.int32(INF32)  # splat constant, never a scalar op
    lane = jax.lax.broadcasted_iota(jnp.int32, (SL, S), 1)
    lane_c = lane
    md = md_ref[:]
    len_a = lena_ref[:]
    len_b = lenb_ref[:]
    # full-shape (SL, S) broadcasts for the lane-wise band/validity masks
    zeros_f = jnp.zeros((SL, S), jnp.int32)
    md_c = md + zeros_f
    lena_c = len_a + zeros_f
    lenb_c = len_b + zeros_f
    W_c = jnp.int32(w_max)

    # row 0 borders: cost(0, j) = j for 0 <= j <= min(len_b, md)
    j0 = lane_c - W_c
    prev_ref[:] = jnp.where(
        (j0 >= 0) & (j0 <= jnp.minimum(lenb_c, md_c)), j0, INF
    )
    final_ref[:] = jnp.full((SL, S), INF, jnp.int32)

    doubling = []
    sh = 1
    while sh < S:
        doubling.append((sh, lane_c < jnp.int32(sh)))
        sh <<= 1
    in_band = jnp.abs(lane_c - W_c) <= md_c
    last_lane = lane_c == jnp.int32(S - 1)

    oksz = oksz_ref[:]

    def loop_cond(carry):
        # early exit: stop as soon as every pair in the group is finished
        i, iv, failed, best_col, best_col_i = carry
        done = jnp.minimum(failed + (len_a < i).astype(jnp.int32) + (1 - oksz), 1)
        return (i <= la_max) & (jnp.min(done) == 0)

    def row(carry):
        # iv is the row counter as a (SL,1) int32 VECTOR (broadcast-friendly
        # form of the i scalar for the lane-wise masks)
        i, iv, failed, best_col, best_col_i = carry
        prev = prev_ref[:]
        iv_f = iv + zeros_f  # full-layout row counter
        active_c = iv_f <= lena_c

        im1 = i - 1
        r = jax.lax.rem(im1, CHUNK)
        base = im1 - r

        @pl.when(r == 0)
        def _refresh():
            b0 = pl.multiple_of(base, CHUNK)
            awin_ref[:] = a_ref[:, pl.ds(b0, CHUNK)]
            bwin_ref[:] = bext_ref[:, pl.ds(b0, SW)]
            twin_ref[:] = tab_ref[:, pl.ds(b0, 2 * CHUNK)]

        # a[i-1] per pair: element r of the window
        ai = pltpu.roll(awin_ref[:], CHUNK - r, axis=1)[:, 0:1]
        # b window: brow[k] = b_ext[(i-1) + k] = element r+k of the window
        brow = pltpu.roll(bwin_ref[:], SW - r, axis=1)[:, :S]
        # early-failure threshold floor(i*R): element r+1 of the window
        thr = pltpu.roll(twin_ref[:], 2 * CHUNK - (r + 1), axis=1)[0:1, 0:1]

        j = lane_c + (iv_f - W_c)
        validj = (j >= 1) & (j <= lenb_c) & in_band & active_c
        mismatch = (brow != (ai + zeros_f)).astype(jnp.int32)
        diag = jnp.where(validj, prev + mismatch, INF)
        up_src = pltpu.roll(prev, S - 1, axis=1)  # == jnp.roll(prev, -1)
        up_src = jnp.where(last_lane, INF, up_src)
        up = jnp.where(validj, up_src + jnp.int32(1), INF)
        D = jnp.minimum(diag, up)
        border = (j == 0) & (iv_f <= md_c) & active_c
        D = jnp.where(border, iv_f, D)

        # exact min-plus prefix scan (INSERT chains) by doubling
        rr = D
        for sh, edge_mask in doubling:
            shifted = pltpu.roll(rr, sh, axis=1)
            shifted = jnp.where(edge_mask, INF, shifted)
            rr = jnp.minimum(rr, shifted + jnp.int32(sh))
        cur = jnp.where(validj | border, rr, INF)

        # early failure: cost(i, i) is lane W
        active = i <= len_a
        diag_cell = _lane_pick(cur, lane, W, INF)
        fail_now = (active & (i > 10) & (i <= len_b) & (diag_cell > thr)).astype(
            jnp.int32
        )
        failed = jnp.maximum(failed, fail_now)

        # far-column running argmin: cost(i, len_b) at lane len_b - i + W
        col_val = _lane_pick(cur, lane, len_b - i + W, INF)
        upd = active & (i >= len_b) & (col_val < best_col)
        best_col = jnp.where(upd, col_val, best_col)
        best_col_i = jnp.where(upd, i, best_col_i)

        final_ref[:] = jnp.where(lena_c == iv_f, cur, final_ref[:])
        prev_ref[:] = jnp.where(active_c, cur, prev)
        return i + 1, iv + jnp.ones((SL, 1), jnp.int32), failed, best_col, best_col_i

    zeros = jnp.zeros((SL, 1), jnp.int32)
    _, _, failed, best_col, best_col_i = jax.lax.while_loop(
        loop_cond,
        row,
        (
            jnp.int32(1),
            jnp.ones((SL, 1), jnp.int32),
            zeros,
            jnp.full((SL, 1), INF),
            zeros,
        ),
    )

    final_row = final_ref[:]
    INF_G = INF
    # goal cell, len_a <= len_b case: first minimum over lanes
    # [W, W + len_b - len_a] of the final row
    maskS = (lane >= W) & (lane <= W + (len_b - len_a))
    rowm = jnp.where(maskS, final_row, INF_G)
    costS = jnp.min(rowm, axis=1, keepdims=True)
    kS = jnp.min(
        jnp.where(rowm == costS, lane, jnp.int32(1 << 30)), axis=1, keepdims=True
    )
    mbS = len_a + (kS - W)

    long = len_a > len_b
    matlen_a = jnp.where(long, best_col_i, len_a)
    matlen_b = jnp.where(long, len_b, mbS)
    cost = jnp.where(long, best_col.astype(jnp.int32), costS)
    diag_cost = jnp.where(
        len_a <= len_b,
        jnp.min(jnp.where(lane == W, final_row, INF_G), axis=1, keepdims=True),
        -1,
    )

    accept = (
        (oksz != 0) & (failed == 0) & (cost < INF)
    ).astype(jnp.int32)

    lane_out = jax.lax.broadcasted_iota(jnp.int32, (SL, 128), 1)
    out = jnp.where(lane_out == 0, accept, 0)
    out = jnp.where(lane_out == 1, cost, out)
    out = jnp.where(lane_out == 2, matlen_a, out)
    out = jnp.where(lane_out == 3, matlen_b, out)
    out = jnp.where(lane_out == 4, diag_cost, out)
    out_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "w_max", "ratio", "maxn", "maxm", "interpret"),
)
def batch_score_pallas(
    a: jax.Array,
    la: jax.Array,
    b: jax.Array,
    lb: jax.Array,
    *,
    la_max: int,
    w_max: int,
    ratio: float = Constants.MAXR,
    maxn: int = Constants.ALIGNER_MAXN,
    maxm: int = Constants.ALIGNER_MAXM,
    interpret: bool = False,
) -> BatchScores:
    """Pallas TPU equivalent of scan.batch_score (same contract).

    a: (B, LA) codes; la: (B,) lengths; b: (B, LB) codes; lb: (B,) lengths.
    """
    B0 = a.shape[0]
    LB = b.shape[1]
    S = _round_up(2 * w_max + 1, CHUNK)
    SL = 8  # pairs per grid program (one per int32 sublane)

    LA_pad = _round_up(max(la_max, a.shape[1]), CHUNK)
    EXT = LA_pad + S + CHUNK
    T_pad = LA_pad + 2 * CHUNK
    tab_len = max(la_max, LB) + 2

    early_thr_np, accept_min_np, band_tab_np = _threshold_tables(ratio, tab_len)
    thr_full = np.zeros(T_pad, np.int32)
    ncopy = min(tab_len + 1, T_pad)
    thr_full[:ncopy] = early_thr_np[:ncopy]
    tab = jnp.asarray(thr_full[None, :], dtype=jnp.int32)
    band_tab = jnp.asarray(band_tab_np)
    accept_min = jnp.asarray(accept_min_np)

    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    la = la.astype(jnp.int32)
    lb = lb.astype(jnp.int32)

    # per-pair geometry (seq_aligner.h:92-107)
    cond = lb >= la
    min_len = jnp.where(cond, la, lb)
    md = band_tab[jnp.clip(min_len, 0, tab_len)]
    len_a = jnp.where(cond, la, jnp.minimum(la, lb + md))
    len_b = jnp.where(cond, jnp.minimum(lb, la + md), lb)
    ok_size = (
        (len_a < maxn + maxm) & (md < maxm) & (md <= w_max) & (len_a <= la_max)
    ).astype(jnp.int32)

    # pad batch to a sublane multiple; padding rows are size-rejected
    B = _round_up(max(B0, 1), SL)
    dpad = B - B0

    def padb(x, fill=0):
        return jnp.pad(x, ((0, dpad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)

    a_p = jnp.pad(padb(a), ((0, 0), (0, LA_pad - a.shape[1])))
    md_p = padb(md[:, None], 1)
    lena_p = padb(len_a[:, None], 1)
    lenb_p = padb(len_b[:, None], 1)
    oksz_p = padb(ok_size[:, None], 0)

    # b_ext[m, t] = b[m, t - W] with -1 sentinel outside [0, lb) — the kernel
    # reads the row-i b window as lanes [i-1, i-1+S) of this array
    t_idx = jnp.arange(EXT, dtype=jnp.int32)[None, :]
    src = t_idx - w_max
    valid = (src >= 0) & (src < lb[:, None])
    gathered = static_shift_edge(b, w_max, EXT)  # static shift, not a gather
    b_ext = padb(jnp.where(valid, gathered, -1), -1)

    grid = (B // SL,)
    cells = la_max * (2 * w_max + 1)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            la_max=la_max,
            w_max=w_max,
            s_pad=S,
            sublanes=SL,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, LA_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, EXT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SL, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SL, S), jnp.int32),
            pltpu.VMEM((SL, S), jnp.int32),
            pltpu.VMEM((SL, CHUNK), jnp.int32),
            pltpu.VMEM((SL, S + CHUNK), jnp.int32),
            pltpu.VMEM((1, 2 * CHUNK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * B * cells, bytes_accessed=B * (LA_pad + EXT) * 4, transcendentals=0
        ),
        interpret=interpret,
    )(tab, a_p, b_ext, md_p, lena_p, lenb_p, oksz_p)

    out = out[:B0]
    accept = (
        (out[:, 0] != 0)
        & (out[:, 3] >= accept_min[jnp.clip(len_b, 0, tab_len)])
    )
    return BatchScores(accept, out[:, 1], out[:, 2], out[:, 3], out[:, 4], len_a)
