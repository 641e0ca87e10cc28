"""Pallas TPU kernel: banded-DP parent emission for traceback.

The r2 traceback pass (align/traceback.py) re-runs the DP as a vmapped XLA
scan that stores 2-bit parents, then walks them on device; the rows scan is
XLA-codegen-bound (~0.41 s for 32 pairs x 3072 rows, insensitive to unroll
and packing — docs/PERF_NOTES.md). This kernel replaces ONLY the
parent-emitting forward pass with a Mosaic kernel in the wavefront.py row
formulation (reference recurrence seq_aligner.h:151-190; parent rule
seq_aligner.h:214-233 with MATCH > INSERT > DELETE tie-breaking identical
to align/banded.py / align/traceback.py — differential-tested in
tests/test_tbwave.py).

Division of labor (all decisions come from screening, which is pinned
bit-identical to the exactness root):

  * the SCREENING pass supplies accept / matlen_a / matlen_b — this kernel
    computes no goal cells, no early-failure, no thresholds;
  * this kernel emits the parent plane: grid (programs, row-blocks), each
    step computes RB=16 DP rows for 8 pairs (sublanes) and writes one
    (8, S) int32 block where bits [2r, 2r+1] of lane k are row (rb*16+r+1)'s
    parent at band offset k — packing is per-lane over ROWS, so no
    cross-lane movement; the DP row state persists in scratch across the
    row-block grid dimension (TPU grids iterate sequentially);
  * the WALK (walk_parents) is the same device while_loop as
    traceback.py's, reading the packed-by-rows format, started from the
    screening-provided goal cell.

Row 0 (the border row) is not stored: its parents are analytic
(INSERT for j in [1, min(len_b, md)], stop at j == 0 — align/banded.py
border init), handled in the walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Constants
from .scan import _threshold_tables, static_shift_edge
from .types import DELETE, INSERT, MATCH

INF32 = np.int32(1 << 28)
CHUNK = 128   # lane-alignment quantum for dynamic slices
RB = 16       # DP rows per grid step = 2-bit parents per int32
SL = 8        # pairs per program (one per int32 sublane)
TB_WALK = 32  # edits emitted per walk iteration (mirror traceback.py)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    a_ref,      # (SL, LA_pad) int32 codes of a
    bext_ref,   # (SL, EXT) int32 pre-shifted b codes (-1 sentinel)
    md_ref,     # (SL, 1) int32 per-pair max_dst
    lena_ref,   # (SL, 1) int32 DP len_a (clamped)
    lenb_ref,   # (SL, 1) int32 DP len_b (clamped)
    out_ref,    # (SL, S) int32 parents: bits [2r, 2r+1] = row rb*16+r+1
    prev_ref,   # scratch (SL, S) int32 — persists across the rb grid dim
    awin_ref,   # scratch (SL, CHUNK) int32
    bwin_ref,   # scratch (SL, S + CHUNK) int32
    *,
    w_max: int,
    s_pad: int,
):
    S = s_pad
    SW = S + CHUNK
    W = w_max
    INF = jnp.int32(INF32)
    rb = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SL, S), 1)
    zeros_f = jnp.zeros((SL, S), jnp.int32)
    md_c = md_ref[:] + zeros_f
    lenb_c = lenb_ref[:] + zeros_f
    lena_c = lena_ref[:] + zeros_f
    W_c = jnp.int32(w_max)
    in_band = jnp.abs(lane - W_c) <= md_c
    last_lane = lane == jnp.int32(S - 1)

    doubling = []
    sh = 1
    while sh < S:
        doubling.append((sh, lane < jnp.int32(sh)))
        sh <<= 1

    @pl.when(rb == 0)
    def _init():
        # row 0 borders: cost(0, j) = j for 0 <= j <= min(len_b, md)
        j0 = lane - W_c
        prev_ref[:] = jnp.where(
            (j0 >= 0) & (j0 <= jnp.minimum(lenb_c, md_c)), j0, INF
        )

    base = rb * RB  # first row of this block is base + 1

    @pl.when(jax.lax.rem(rb, CHUNK // RB) == 0)
    def _refresh():
        # base is a multiple of CHUNK whenever this fires (rb % 8 == 0)
        b0 = pl.multiple_of(base, CHUNK)
        awin_ref[:] = a_ref[:, pl.ds(b0, CHUNK)]
        bwin_ref[:] = bext_ref[:, pl.ds(b0, SW)]

    off = base - (base // CHUNK) * CHUNK  # traced in-window offset
    pwords = zeros_f
    prev = prev_ref[:]
    for r in range(RB):
        i = base + r + 1
        iv_f = zeros_f + i
        active_c = iv_f <= lena_c
        rr_off = off + r
        # a[i-1]: element rr_off of the window
        ai = pltpu.roll(awin_ref[:], CHUNK - rr_off, axis=1)[:, 0:1]
        # b window: brow[k] = b_ext[(i-1) + k] = element rr_off + k
        brow = pltpu.roll(bwin_ref[:], SW - rr_off, axis=1)[:, :S]

        j = lane + (iv_f - W_c)
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

        # parents, MATCH > INSERT > DELETE (traceback.py block body)
        left = pltpu.roll(cur, 1, axis=1)
        left_plus1 = jnp.where(lane == 0, INF, left) + jnp.int32(1)
        par = jnp.full((SL, S), jnp.int32(DELETE), jnp.int32)
        par = jnp.where(cur == left_plus1, jnp.int32(INSERT), par)
        par = jnp.where(cur == diag, jnp.int32(MATCH), par)
        par = jnp.where(border, jnp.int32(DELETE), par)
        par = jnp.where(validj | border, par, jnp.int32(0))
        pwords = pwords | (par << jnp.int32(2 * r))

        prev = jnp.where(active_c, cur, prev)

    prev_ref[:] = prev
    out_ref[:] = pwords


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "w_max", "ratio", "rows_max", "interpret"),
)
def batch_parents_pallas(
    a: jax.Array,
    la: jax.Array,
    b: jax.Array,
    lb: jax.Array,
    *,
    la_max: int,
    w_max: int,
    ratio: float = Constants.MAXR,
    rows_max: int | None = None,
    interpret: bool = False,
):
    """Emit the packed parent plane for a batch of alignments.

    Returns (parents, md, len_b_dp): parents is (B, NRB, S) int32 with
    bits [2r, 2r+1] of [q, rb, k] = the parent code of DP cell
    (i = rb*16 + r + 1, band offset k) of pair q; md / len_b_dp are the
    per-pair band geometry the walk needs.
    """
    B0 = a.shape[0]
    LB = b.shape[1]
    S = _round_up(2 * w_max + 1, CHUNK)
    R = _round_up(min(la_max, rows_max) if rows_max else la_max, CHUNK)
    NRB = R // RB
    tab_len = max(la_max, LB, a.shape[1]) + 2
    _, _, band_tab_np = _threshold_tables(ratio, tab_len)
    band_tab = jnp.asarray(band_tab_np)

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

    LA_pad = _round_up(max(R, a.shape[1]) + 1, CHUNK)
    EXT = LA_pad + S + CHUNK

    Bp = _round_up(max(B0, 1), SL)
    dpad = Bp - B0

    def padb(x, fill=0):
        return jnp.pad(x, ((0, dpad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)

    a_p = jnp.pad(padb(a), ((0, 0), (0, LA_pad - a.shape[1])))
    md_p = padb(md[:, None], 1)
    lena_p = padb(len_a[:, None], 0)
    lenb_p = padb(len_b[:, None], 0)

    # b_ext[m, t] = b[m, t - W] with -1 sentinel outside [0, lb)
    t_idx = jnp.arange(EXT, dtype=jnp.int32)[None, :]
    src = t_idx - w_max
    valid = (src >= 0) & (src < lb[:, None])
    gathered = static_shift_edge(b, w_max, EXT)  # static shift, not a gather
    b_ext = padb(jnp.where(valid, gathered, -1), -1)

    P = Bp // SL
    parents = pl.pallas_call(
        functools.partial(_kernel, w_max=w_max, s_pad=S),
        grid=(P, NRB),
        in_specs=[
            pl.BlockSpec((SL, LA_pad), lambda p, rb: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, EXT), lambda p, rb: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda p, rb: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda p, rb: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda p, rb: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SL, S), lambda p, rb: (p, rb), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, NRB * S), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SL, S), jnp.int32),
            pltpu.VMEM((SL, CHUNK), jnp.int32),
            pltpu.VMEM((SL, S + CHUNK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * Bp * R * (S // 128),
            bytes_accessed=Bp * (LA_pad + EXT + NRB * S) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, b_ext, md_p, lena_p, lenb_p)

    return parents[:B0].reshape(B0, NRB, S), md, len_b


@functools.partial(jax.jit, static_argnames=("w_max", "e_max"))
def walk_parents(
    parents: jax.Array,  # (B, NRB, S) int32 packed parents
    b: jax.Array,        # (B, LB) codes (for MATCH/INSERT vals)
    lb_dp: jax.Array,    # (B,) DP len_b (for the row-0 analytic border)
    md: jax.Array,       # (B,)
    matlen_a: jax.Array,  # (B,) start cell (from screening)
    matlen_b: jax.Array,
    accept: jax.Array,   # (B,) bool
    *,
    w_max: int,
    e_max: int,
):
    """Walk the packed parent plane back from (matlen_a, matlen_b),
    emitting left-aligned edit streams — the device find_path
    (seq_aligner.h:214-233), identical to traceback.py's walk."""
    W = w_max
    S = parents.shape[2]
    E = e_max
    LB = b.shape[1]

    def one(pw, b_row, lbi, mdi, ma, mb, acc):
        lim = jnp.minimum(lbi, mdi)

        def tb_cond(state):
            i, j, t, done, ops_buf, vals_buf = state
            return acc & ~done & (t + TB_WALK <= E)

        def tb_body(state):
            i, j, t, done, ops_buf, vals_buf = state
            ops_blk = jnp.zeros(TB_WALK, jnp.uint8)
            vals_blk = jnp.zeros(TB_WALK, jnp.uint8)
            emitted = jnp.int32(0)
            for r in range(TB_WALK):
                k = jnp.clip(j - i + W, 0, S - 1)
                im1 = jnp.maximum(i - 1, 0)
                word = pw[im1 >> 4, k]
                p_dp = (word >> ((im1 & 15) * 2)) & 3
                p_row0 = jnp.where((j >= 1) & (j <= lim), INSERT, 0)
                p = jnp.where(done, 0, jnp.where(i == 0, p_row0, p_dp)).astype(
                    jnp.uint8
                )
                live = p != 0
                ops_blk = ops_blk.at[TB_WALK - 1 - r].set(p)
                bval = b_row[jnp.clip(j - 1, 0, LB - 1)].astype(jnp.uint8)
                vals_blk = vals_blk.at[TB_WALK - 1 - r].set(
                    jnp.where(live & (p != DELETE), bval, jnp.uint8(0))
                )
                emitted = emitted + live.astype(jnp.int32)
                done = done | ~live
                i = i - jnp.where(live & (p != INSERT), 1, 0)
                j = j - jnp.where(live & (p != DELETE), 1, 0)
            ops_buf = jax.lax.dynamic_update_slice(ops_buf, ops_blk, (E - t - TB_WALK,))
            vals_buf = jax.lax.dynamic_update_slice(vals_buf, vals_blk, (E - t - TB_WALK,))
            return i, j, t + emitted, done, ops_buf, vals_buf

        ops_buf = jnp.zeros(E, jnp.uint8)
        vals_buf = jnp.zeros(E, jnp.uint8)
        _, _, nedit, _, ops_buf, vals_buf = jax.lax.while_loop(
            tb_cond,
            tb_body,
            (ma, mb, jnp.int32(0), ~acc, ops_buf, vals_buf),
        )
        ops_out = jnp.roll(ops_buf, -(E - nedit))
        vals_out = jnp.roll(vals_buf, -(E - nedit))
        return ops_out, vals_out, nedit

    return jax.vmap(one)(
        parents, b, lb_dp.astype(jnp.int32), md.astype(jnp.int32),
        matlen_a.astype(jnp.int32), matlen_b.astype(jnp.int32),
        accept.astype(bool),
    )
