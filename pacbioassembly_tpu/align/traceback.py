"""Batched alignment WITH traceback (device-side, lax.scan + while_loop).

Second pass of the two-phase device design (SURVEY.md §7 "traceback on
TPU"): the screening kernel (scan.py / wavefront.py) scores thousands of
candidates without storing parents; the few accepted alignments are then
re-run through this pass, which stores one parent code per band cell and
walks them back on device, emitting left-aligned edit streams that feed
consensus voting (parallel.device_elect) directly — no host DP needed for
interior alignments.

Parent semantics and tie-breaking are identical to align/banded.py
(MATCH > INSERT > DELETE on equal cost; reference seq_aligner.h:161-233).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Constants
from .scan import BatchScores, _threshold_tables
from .types import DELETE, INSERT, MATCH

INF = np.int32(1 << 28)
# rows per scan step: the sequential scan's per-step overhead dominates
# this pass on TPU, so each step computes a block of UNROLL_TB rows with
# statically unrolled bodies (same trick as bitwave's 32-column blocks)
UNROLL_TB = int(os.environ.get("PBTPU_TB_UNROLL", "32"))
# edits emitted per traceback while_loop iteration (static inner unroll:
# one dynamic_update_slice per block instead of one scatter per edit)
TB_WALK = 32


class TracebackResult(NamedTuple):
    scores: BatchScores
    ops: jax.Array   # (B, E) uint8, left-aligned edit opcodes, 0-padded
    vals: jax.Array  # (B, E) uint8 b-side codes for MATCH/INSERT
    nedit: jax.Array  # (B,) int32


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "w_max", "ratio", "maxn", "maxm", "e_max", "rows_max"),
)
def batch_align_traceback(
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
    e_max: int | None = None,
    rows_max: int | None = None,
) -> TracebackResult:
    """rows_max (static) optionally bounds the scanned DP rows below la_max
    when the caller knows max(la) for this batch — the sequential scan's
    per-step overhead dominates this pass on TPU, so halving rows nearly
    halves its wall time. Must satisfy rows_max >= max over the batch of
    len_a (len_a <= la always, so rows_max >= max(la) is sufficient)."""
    R = la_max if rows_max is None else min(la_max, rows_max)
    R = -(-R // UNROLL_TB) * UNROLL_TB
    S = 2 * w_max + 1
    LB = b.shape[1]
    # nedit <= matlen_b + #DELETE <= len_a + max_dst (+ block slack):
    # every edit advances a or b, deletions are bounded by the band
    E = e_max if e_max is not None else R + w_max + 2 + TB_WALK
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

    S4 = -(-S // 4)  # 2-bit parent codes packed 4 per byte

    def _pack_par(par):
        """(S,) uint8 parent codes (0..3) -> (S4,) packed 4-per-byte."""
        p = jnp.pad(par, (0, S4 * 4 - S))
        q = p.reshape(S4, 4).astype(jnp.uint8)
        return q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)

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
        par0 = jnp.where(
            (j0 >= 1) & (j0 <= jnp.minimum(len_b, md)), INSERT, 0
        ).astype(jnp.uint8)
        failed0 = la_i < 0
        final_row0 = jnp.full(S, INF, jnp.int32) + la_i * 0
        # the DP row's b window b[j-1], j = k + i - W, is a CONTIGUOUS
        # slice per row — a dynamic_slice of a padded copy instead of a
        # (S,)-wide arbitrary gather (gathers are the slow path on TPU)
        bpad = jnp.pad(b_row, (W + 2, R + 2 * W + 4))

        def block(carry, i_vec):
            prev, failed, final_row = carry
            col_blk, par_blk = [], []
            for r in range(UNROLL_TB):
                i = i_vec[r]
                active = i <= len_a
                j = k_idx + (i - W)
                in_band = jnp.abs(k_idx - W) <= md
                validj = (j >= 1) & (j <= len_b) & in_band & active
                bj = jax.lax.dynamic_slice(bpad, (i + 1,), (S,))
                ai = a_row[i - 1]
                mismatch = (bj != ai).astype(jnp.int32)
                diag = jnp.where(validj, prev + mismatch, INF)
                up = jnp.where(validj, jnp.roll(prev, -1).at[-1].set(INF) + 1, INF)
                D = jnp.minimum(diag, up)
                border = (j == 0) & (i <= md) & active
                D = jnp.where(border, i, D)
                rr = k_idx + jax.lax.cummin(D - k_idx)
                cur = jnp.where(validj | border, rr, INF).astype(jnp.int32)

                # parents: MATCH > INSERT > DELETE preference
                left_plus1 = jnp.roll(cur, 1).at[0].set(INF) + 1
                par = jnp.full(S, DELETE, jnp.uint8)
                par = jnp.where(cur == left_plus1, jnp.uint8(INSERT), par)
                par = jnp.where(cur == diag, jnp.uint8(MATCH), par)
                par = jnp.where(border, jnp.uint8(DELETE), par)
                par = jnp.where(validj | border, par, jnp.uint8(0))

                fail_now = (
                    active
                    & (i > 10)
                    & (i <= len_b)
                    & (cur[W] > early_thr[jnp.minimum(i, tab_len)])
                )
                failed = failed | fail_now
                final_row = jnp.where(i == len_a, cur, final_row)
                k_col = len_b - i + W
                col_ok = (k_col >= 0) & (k_col < S) & active
                col_blk.append(jnp.where(col_ok, cur[jnp.clip(k_col, 0, S - 1)], INF))
                par_blk.append(_pack_par(par))
                prev = jnp.where(active, cur, prev)
            return (prev, failed, final_row), (jnp.stack(col_blk), jnp.stack(par_blk))

        (prev, failed, final_row), (col_list, par_rows) = jax.lax.scan(
            block,
            (prev0, failed0, final_row0),
            jnp.arange(1, R + 1, dtype=jnp.int32).reshape(R // UNROLL_TB, UNROLL_TB),
        )
        col_list = col_list.reshape(R)
        par_rows = par_rows.reshape(R, S4)
        parents = jnp.concatenate([_pack_par(par0)[None, :], par_rows])  # (R+1, S4)

        col0 = jnp.where(len_b <= md, len_b, INF).astype(jnp.int32)
        cols = jnp.concatenate([col0[None], col_list])

        long = len_a > len_b
        ii = jnp.arange(R + 1, dtype=jnp.int32)
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

        # in-device traceback (find_path, seq_aligner.h:214-233), emitted
        # back-to-front into fixed-width buffers then left-aligned by roll.
        # TB_WALK edits per iteration with a statically unrolled body and
        # ONE dynamic_update_slice per buffer per block — the per-edit
        # scatter version spent ~100us of loop/scatter overhead per edit
        def tb_cond(state):
            i, j, t, done, ops_buf, vals_buf = state
            return accept & ~done & (t + TB_WALK <= E)

        def tb_body(state):
            i, j, t, done, ops_buf, vals_buf = state
            ops_blk = jnp.zeros(TB_WALK, jnp.uint8)
            vals_blk = jnp.zeros(TB_WALK, jnp.uint8)
            emitted = jnp.int32(0)
            for r in range(TB_WALK):
                k = jnp.clip(j - i + W, 0, S - 1)
                pbyte = parents[i, k >> 2]
                p = jnp.where(
                    done,
                    jnp.uint8(0),
                    (pbyte >> ((k & 3) * 2).astype(jnp.uint8)) & jnp.uint8(3),
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
            # the block's real edits occupy its top `emitted` slots, which
            # land exactly at [E - t - emitted, E - t); the zero slots
            # below are past the stream end and never read
            ops_buf = jax.lax.dynamic_update_slice(ops_buf, ops_blk, (E - t - TB_WALK,))
            vals_buf = jax.lax.dynamic_update_slice(vals_buf, vals_blk, (E - t - TB_WALK,))
            return i, j, t + emitted, done, ops_buf, vals_buf

        ops_buf = jnp.zeros(E, jnp.uint8)
        vals_buf = jnp.zeros(E, jnp.uint8)
        i_f, j_f, nedit, _, ops_buf, vals_buf = jax.lax.while_loop(
            tb_cond,
            tb_body,
            (matlen_a, matlen_b, jnp.int32(0), ~accept, ops_buf, vals_buf),
        )
        # left-align: the stream occupies [E-nedit, E)
        ops_out = jnp.roll(ops_buf, -(E - nedit))
        vals_out = jnp.roll(vals_buf, -(E - nedit))
        return accept, cost, matlen_a, matlen_b, diag_cost, len_a, ops_out, vals_out, nedit

    acc, cost, ma, mb, dc, rows, ops, vals, nedit = jax.vmap(one)(a, la, b, lb)
    return TracebackResult(
        BatchScores(acc, cost, ma, mb, dc, rows), ops, vals, nedit
    )
