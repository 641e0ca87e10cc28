"""Pallas TPU kernel: banded Myers bit-parallel screening (~32 cells/lane).

The production screening kernel. Same contract and bit-identical decisions
as wavefront.batch_score_pallas / scan.batch_score (the reference's banded
DP, seq_aligner.h:151-213), but each VPU lane holds 32 band cells as bits
in Myers/Hyyrö delta encoding (exactness root: align/bitparallel.py, whose
word-vectorized algebra this kernel executes; see its derivation notes).

Design (all parity-critical choices are pinned by tests/test_bitwave.py):

  * SL x NB alignments per grid program: up to SL sublanes (VMEM-capped
    per geometry by _pick_sl), and when the
    band fits, NB pair-blocks side by side in the 128-lane dimension
    (each pair's stripe is a multiword bitvector in its block's lanes;
    every cross-word lane roll is re-masked at block boundaries). Wide
    arrays amortize Mosaic's fixed per-op cost — this, not op count, is
    the first-order performance knob on v5e.

  * transpose normalization: edit distance is symmetric and the band and
    the early-failure diagonal cells are orientation-invariant, so pairs
    with len_a > len_b are scored as (b, a). That removes the far-column
    goal scan (seq_aligner.h:196-204) entirely — the kernel only ever
    computes the len_a <= len_b case, and the far-row goal
    (seq_aligner.h:205-212) is recovered OUTSIDE the kernel from the final
    column's vertical deltas (validated exhaustively vs the banded DP).

  * center-aligned bit coordinates: row j at column i lives at the
    block-local bit q = CEN + (j - i) with CEN static (CEN % 32 == 16),
    so the center-score bits (q = CEN-1, CEN), the border-row injection
    (q = CEN - i), and the PM window offset (exactly i) are uniform
    across pairs; only the stripe mask [CEN-md, CEN+md] and the top-bit
    mask (CEN+md) vary per pair, and those are precomputed host-side.

  * p-domain recurrence: the carried state is the SHIFTED deltas
    (VPp = shr1(VP) | top, VNp = shr1(VN)); shr1 distributes over &/| and
    cancels shl1, so one column needs a single cross-word roll for the
    state update instead of four.

  * the center score D(i,i) is accumulated per-lane (every lane adds the
    delta bits of its own word; only the lane holding word CEN>>5 is the
    real score, read back at the end) — no cross-lane extraction in the
    loop at all.

  * 32-column unrolled blocks: the while_loop advances 32 columns per
    iteration (block k covers i in [32k, 32k+31]), so the PEQ window
    refresh is unconditional once per block, every in-word bit offset is
    STATIC inside the unrolled body, and scalar loop overhead amortizes.

  * the Myers addition's cross-word carries resolve with a Kogge-Stone
    prefix over (generate, propagate) word masks, using X subset-of VPp
    to shorten the generate term.

  * a while_loop exits as soon as every pair in the program is finished
    (early-failed / size-rejected / past its last column), at 32-column
    granularity.

Outputs per pair: final-column p-domain VP/VN words + the center score;
the XLA wrapper computes goal cells, un-transposes, and applies the
acceptance thresholds (integer tables precomputed on host in float64 —
no float32 on device, matching scan.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Constants
from .scan import BatchScores, _threshold_tables, static_shift_edge

INF32 = np.int32(1 << 28)
CHUNK = 128
UNROLL = 32
# max sublanes (pairs) per program row: more sublanes = more vregs per
# vector op, amortizing Mosaic's per-op fixed cost (measured 8->32->64->128
# gave 7.1->12.7->14.1->16.0 Gcells/s on v5e; 256 saturates at the same
# speed with 13x the compile time). The per-call _pick_sl halves this for
# big-band geometries so the working set stays inside VMEM. Env-tunable
# for hardware retuning.
SL = int(os.environ.get("PBTPU_BITWAVE_SL", "128"))
# keep the provably-redundant Kogge-Stone wrap masks (1, default) or drop
# them (0) — see the up() note in _kernel; experiment knob for VERDICT r2
# item 5 (op-count cut in the carry resolution)
_KSMASK = os.environ.get("PBTPU_BITWAVE_KSMASK", "1") != "0"
# TIMING-ONLY ablation knob: cap the Kogge-Stone doubling depth at N
# steps (0 = exact full depth). A truncated carry chain produces WRONG
# alignments — the knob exists solely to measure what share of kernel
# wall time the carry resolution actually costs (benchmarks/ks_depth.py,
# VERDICT r4 item 5); never set it in production.
_KSDEPTH = int(os.environ.get("PBTPU_BITWAVE_KSDEPTH", "0"))


def _pick_sl(KA: int, PBL: int, L: int, NB: int) -> int:
    """Largest sublane count <= SL whose double-buffered VMEM working set
    fits the budget (in/out blocks are pipelined 2x; scratch is single)."""
    budget = 10 * 1024 * 1024
    inb = (NB * KA + NB * 4 * PBL + 5 * L) * 4
    outb = 4 * L * 4
    scratch = (4 * L + NB * CHUNK) * 4
    sl = SL
    while sl > 8 and sl * (2 * (inb + outb) + scratch) > budget:
        sl //= 2
    return max(sl, 8)


U32 = jnp.uint32
FULL = np.uint32(0xFFFFFFFF)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(w_max: int):
    """Static geometry: center bit, words per stripe, lane width, blocks.

    NB lane-blocking packs NB pairs side by side in the 128-lane dim to
    recover dead lanes when the stripe is narrow. Historically pinned to 1
    (273 s Mosaic compiles at SL=64 for +15% runtime); env-tunable for
    re-measurement now that the persistent compile cache amortizes the
    compile (PBTPU_BITWAVE_NB=0 picks the largest NB that fits)."""
    cen = 16 if w_max <= 16 else _round_up(w_max - 16, 32) + 16
    words = (cen + w_max) // 32 + 2  # stripe top + carry-overflow slack
    lanes = _round_up(words + 1, CHUNK)
    nb_req = int(os.environ.get("PBTPU_BITWAVE_NB", "1"))
    if nb_req <= 0:
        nb_req = CHUNK  # auto: widest block count that fits
    nb = 1
    for cand in range(min(nb_req, lanes // (words + 1)), 0, -1):
        if lanes % cand == 0 and lanes // cand > words:
            nb = cand
            break
    bw = lanes // nb
    return cen, words, lanes, nb, bw


def _roll(x, sh):
    """Lane roll (right rotation by sh) of a uint32 array; int32-only op."""
    return pltpu.bitcast(pltpu.roll(pltpu.bitcast(x, jnp.int32), sh, axis=1), U32)


def _kernel(
    tab_ref,    # (1, T_pad) int32 thresholds floor(i*R) in SMEM (scalar reads)
    ka_ref,     # (SL, NB*KA) int32 kernel-a codes, PRE-SHIFTED: ka[t]=a[t-1]
    peq_ref,    # (SL, NB*4*PBL) uint32 per-letter match bits of kernel-b
    smask_ref,  # (SL, L) uint32 stripe mask [CEN-md, CEN+md] (block-local)
    tmask_ref,  # (SL, L) uint32 top bit CEN+md (block-local)
    md_ref,     # (SL, L) int32 (broadcast over each pair's block lanes)
    lena_ref,   # (SL, L) int32 kernel len_a (= min(len_a, len_b))
    oksz_ref,   # (SL, L) int32 size-accept flag
    words_ref,  # out (SL, 2L) uint32: [final VPp | final VNp]
    scal_ref,   # out (SL, 2L) int32: [S_c per lane | failed per lane]
    pwin_ref,   # scratch (SL, 4*L) uint32 PEQ windows (letter-major, blocked)
    awin_ref,   # scratch (SL, NB*CHUNK) int32
    *,
    cols_max: int,
    cen: int,
    words: int,
    lanes: int,
    nb: int,
    bw: int,
    pbl: int,
    sl: int,
):
    L = lanes
    NB = nb
    BW = bw
    SLK = sl
    WC = cen >> 5  # block-local word holding bits CEN-1 (15) / CEN (16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SLK, L), 1)
    lane_mod = jax.lax.rem(lane, BW) if NB > 1 else lane
    up_masks = {}
    sh = 1
    while sh < words:
        up_masks[sh] = (lane_mod >= sh).astype(U32) * FULL
        sh <<= 1
    if 1 not in up_masks:
        up_masks[1] = (lane_mod >= 1).astype(U32) * FULL
    not_last = (lane_mod < BW - 1).astype(U32) * FULL
    if NB > 1:
        blockmask = [
            ((lane >= b * BW) & (lane < (b + 1) * BW)).astype(U32) * FULL
            for b in range(NB)
        ]
        blocksel = [(lane >= b * BW) & (lane < (b + 1) * BW) for b in range(NB)]
    centermask = (lane_mod == WC) & (lane < NB * BW)

    def shr1(x):
        hi = _roll(x, L - 1) & not_last  # word v <- v+1 (block wrap zeroed)
        return (x >> U32(1)) | (hi << U32(31))

    def up(x, sh):
        """Word v <- v-sh. The roll wraps old lanes [L-sh, L) into [0, sh);
        when every live word sits below L-sh (gen/prop are zero above
        `words`), the wrapped-in lanes are zeros and the mask is free."""
        r = pltpu.roll(x, sh, axis=1)
        # The mask is provably redundant when words <= L - sh AND the
        # blocks don't share lanes (NB == 1): gen/prop are zero above the
        # top live word, so the wrapped lanes bring in zeros. Measured at
        # B=2048 (benchmarks/results/ks_ablation_r4.json): masked is 1.2%
        # faster at runtime but compiles 162.8 s vs maskless 11.7 s.
        # Masked stays the default (runtime recurs, compile is cached);
        # PBTPU_BITWAVE_KSMASK=0 is the fast-compile iteration knob.
        if nb == 1 and words <= L - sh and not _KSMASK:
            return r
        return r & pltpu.bitcast(up_masks[sh], jnp.int32)

    def add_carry(x, y):
        """x + y with carry lookahead; requires x & y == x (subset)."""
        s = x + y
        # per-word carry-out/propagate masks (0 / FFFFFFFF)
        gen = pltpu.bitcast((x | (y & ~s)) >> U32(31), jnp.int32) * jnp.int32(-1)
        prop = jnp.where(
            pltpu.bitcast(s, jnp.int32) == jnp.int32(-1), jnp.int32(-1), 0
        )
        sh = 1
        steps = 0
        while sh < words:
            gen = gen | (prop & up(gen, sh))
            if sh * 2 < words:
                prop = prop & up(prop, sh)
            sh <<= 1
            steps += 1
            if _KSDEPTH and steps >= _KSDEPTH:
                break  # timing-only truncation (see _KSDEPTH)
        cin = pltpu.bitcast(up(gen, 1), U32) & U32(1)
        return s + cin

    smask = smask_ref[:]
    tmask = tmask_ref[:]
    smask_p = shr1(smask)  # stripe mask of the p-domain state
    md = md_ref[:]
    lena = lena_ref[:]
    oksz = oksz_ref[:]

    def loop_cond(carry):
        k, VPp, VNp, S_c, failed, fVP, fVN = carry
        i0 = k * UNROLL
        done = jnp.minimum(failed + (lena < i0).astype(jnp.int32) + (1 - oksz), 1)
        return (i0 <= cols_max) & (jnp.min(jnp.where(centermask, done, 1)) == 0)

    def block(carry):
        k, VPp, VNp, S_c, failed, fVP, fVN = carry
        i0 = k * UNROLL

        # PEQ window for bits [32k, 32k + ...): one rotate per letter/block
        for c in range(4):
            if NB == 1:
                pwin_ref[:, c * L : (c + 1) * L] = _roll(
                    peq_ref[:, c * pbl : (c + 1) * pbl], pbl - k
                )[:, :L]
            else:
                acc = None
                for b in range(NB):
                    seg = peq_ref[:, (b * 4 + c) * pbl : (b * 4 + c + 1) * pbl]
                    rolled = _roll(seg, (b * BW - k) % pbl) & blockmask[b]
                    acc = rolled if acc is None else (acc | rolled)
                pwin_ref[:, c * L : (c + 1) * L] = acc

        @pl.when(jax.lax.rem(k, 4) == 0)
        def _refresh_a():
            b0 = i0  # multiple of 128 when k % 4 == 0
            for b in range(NB):
                awin_ref[:, b * CHUNK : (b + 1) * CHUNK] = ka_ref[
                    :, pl.ds(pl.multiple_of(b0 + b * (ka_ref.shape[1] // NB), CHUNK), CHUNK)
                ]

        off = (i0 - (i0 // CHUNK) * CHUNK).astype(jnp.int32)
        aiw = [
            pltpu.roll(awin_ref[:, b * CHUNK : (b + 1) * CHUNK], CHUNK - off, axis=1)
            for b in range(NB)
        ]  # lanes r: a[i0+r-1] per block

        p0 = pwin_ref[:, 0 * L : 1 * L]
        p1 = pwin_ref[:, 1 * L : 2 * L]
        p2 = pwin_ref[:, 2 * L : 3 * L]
        p3 = pwin_ref[:, 3 * L : 4 * L]

        for r in range(UNROLL):
            i = i0 + r
            active = i <= lena
            if r == 0:
                active = active & (k > 0)  # block 0 starts at column 1

            if NB == 1:
                ai = aiw[0][:, r : r + 1]
            else:
                ai = aiw[NB - 1][:, r : r + 1]
                for b in range(NB - 2, -1, -1):
                    ai = jnp.where(blocksel[b], aiw[b][:, r : r + 1], ai)
            thr = tab_ref[0, i]  # SMEM scalar read -> splat compare
            bit0 = (ai & 1) == 1
            bit1 = (ai >> 1) == 1
            sel = jnp.where(bit1, jnp.where(bit0, p3, p2), jnp.where(bit0, p1, p0))
            if r == 0:
                PM = sel & smask
            else:
                sel_hi = _roll(sel, L - 1)  # cross-block wrap masked by smask
                PM = ((sel >> U32(r)) | (sel_hi << U32(32 - r))) & smask

            # p-domain recurrence: the carried state IS the shifted deltas
            # VPp = shr1(VP)|tmask, VNp = shr1(VN) — shr1 distributes over
            # &/| and cancels shl1, so the whole column needs ONE roll for
            # the state update (shr1(Xv)) instead of four
            X = PM & VPp
            SUM = add_carry(X, VPp)
            Xh = (SUM ^ VPp) | PM
            Ph = VNp | ~(Xh | VPp)
            Mh = VPp & Xh

            # border row j=0 at q = CEN - i while i <= md; (CEN - i) & 31 is
            # static inside the block, the word index is traced
            qb = cen - i
            bbit = U32(1 << ((cen - r) & 31))
            bmask = jnp.where((lane_mod == (qb >> 5)) & (i <= md), bbit, U32(0))
            Ph = Ph | bmask
            Mh = Mh & ~bmask

            Xv_s = shr1(PM | VNp)
            VPp_new = ((Mh | ~(Xv_s | Ph)) & smask_p) | tmask
            VNp_new = Ph & Xv_s & smask_p

            # center score D(i,i): dh = bit CEN-1 of Ph/Mh, dv = bit CEN of
            # VP_new/VN_new = bit CEN-1 of the p-domain state. Every lane
            # accumulates its own word's bit 15; only lane WC of each block
            # holds the true score (read back post-loop)
            dh = ((Ph >> U32(15)) & U32(1)).astype(jnp.int32) - (
                (Mh >> U32(15)) & U32(1)
            ).astype(jnp.int32)
            dv = ((VPp_new >> U32(15)) & U32(1)).astype(jnp.int32) - (
                (VNp_new >> U32(15)) & U32(1)
            ).astype(jnp.int32)
            S_c_new = S_c + dh + dv

            # `failed` records the FIRST failing column (0 = never failed),
            # giving the reference-equivalent abort row for dp accounting
            fail_now = centermask & active & (i > 10) & (S_c_new > thr)
            failed = jnp.where(fail_now & (failed == 0), jnp.int32(i), failed)

            cap = lena == i
            fVP = jnp.where(cap, VPp_new, fVP)
            fVN = jnp.where(cap, VNp_new, fVN)
            VPp = jnp.where(active, VPp_new, VPp)
            VNp = jnp.where(active, VNp_new, VNp)
            S_c = jnp.where(active, S_c_new, S_c)

        return k + 1, VPp, VNp, S_c, failed, fVP, fVN

    zeros = jnp.zeros((SLK, L), jnp.int32)
    zvec = jnp.zeros((SLK, L), U32)
    _, _, _, S_c, failed, fVP, fVN = jax.lax.while_loop(
        loop_cond,
        block,
        (jnp.int32(0), smask_p | tmask, zvec, zeros, zeros, zvec, zvec),
    )

    words_ref[:, :L] = fVP
    words_ref[:, L:] = fVN
    scal_ref[:, :L] = S_c
    scal_ref[:, L:] = failed


def _dims(B0: int, LA: int, LB: int, la_max: int, w_max: int) -> dict:
    """Static launch geometry, shared by the prep / kernel / post stages."""
    cen, words, L, NB, BW = _plan(w_max)
    cols_max = min(LB, la_max)  # kernel-a = min side
    KA = _round_up(cols_max + UNROLL + 1, CHUNK)
    KB = max(LA, LB)
    PBL = _round_up(-(-(KB + cen + w_max + 2) // 32) + 1, CHUNK)
    if NB > 1 and PBL != L:
        NB, BW = 1, L  # lane-blocked PEQ windows need the one-vreg geometry
    SLC = _pick_sl(KA, PBL, L, NB)
    GRP = SLC * NB
    B = _round_up(max(B0, 1), GRP)
    return dict(
        cen=cen, words=words, L=L, NB=NB, BW=BW, cols_max=cols_max, KA=KA,
        KB=KB, PBL=PBL, SLC=SLC, T_pad=KA, B=B, P=B // GRP,
    )


def _prep(a, la, b, lb, *, la_max, w_max, ratio, maxn, maxm):
    """XLA dispatch prep: geometry, thresholds, PEQ build, masks, blocked
    packing — everything between (a, la, b, lb) and the pallas_call's
    inputs. Split from the kernel so bench.py can time the stages
    separately (the r3 lesson: ~30% of what the roofline attributed to
    the kernel was actually this stage's since-removed gathers).
    Returns (kernel inputs tuple, aux tuple for _post)."""
    B0 = a.shape[0]
    LA = a.shape[1]
    LB = b.shape[1]
    d = _dims(B0, LA, LB, la_max, w_max)
    cen, L, NB, BW = d["cen"], d["L"], d["NB"], d["BW"]
    KA, KB, PBL, SLC = d["KA"], d["KB"], d["PBL"], d["SLC"]
    T_pad, B, P = d["T_pad"], d["B"], d["P"]
    tab_len = max(la_max, LB, LA) + 2

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

    # per-pair geometry (seq_aligner.h:92-107) in the ORIGINAL orientation
    cond = lb >= la
    min_len = jnp.where(cond, la, lb)
    md = band_tab[jnp.clip(min_len, 0, tab_len)]
    len_a = jnp.where(cond, la, jnp.minimum(la, lb + md))
    len_b = jnp.where(cond, jnp.minimum(lb, la + md), lb)
    ok_size = (
        (len_a < maxn + maxm) & (md < maxm) & (md <= w_max) & (len_a <= la_max)
    ).astype(jnp.int32)

    # transpose normalization: kernel always sees klena <= klenb
    swap = len_a > len_b
    klena = jnp.minimum(len_a, len_b)
    klenb = jnp.maximum(len_a, len_b)

    def to_width(x, width):
        if x.shape[1] < width:
            return jnp.pad(x, ((0, 0), (0, width - x.shape[1])))
        return x[:, :width]

    # kernel-a pre-shifted by one (ka[t] = a[t-1]) so block windows align
    ka_raw = jnp.where(swap[:, None], to_width(b, KA - 1), to_width(a, KA - 1))
    ka = jnp.pad(ka_raw, ((0, 0), (1, 0)))
    kb = jnp.where(swap[:, None], to_width(a, KB), to_width(b, KB))

    # PEQ: bit t of letter c = (kb[t - cen - 1] == c), rows in [0, klenb).
    # The shift is static, so it's edge-padding, not a gather (the gather
    # form cost ~6 s/round at 65k-candidate prefilter launches).
    t_idx = jnp.arange(PBL * 32, dtype=jnp.int32)
    src = t_idx - cen - 1
    bch = static_shift_edge(kb, cen + 1, PBL * 32)
    in_rng = (src[None, :] >= 0) & (src[None, :] < klenb[:, None])
    weights = (U32(1) << jnp.arange(32, dtype=U32))[None, None, :]
    peq = jnp.stack(
        [
            (((bch == c) & in_rng).astype(U32).reshape(B0, PBL, 32) * weights).sum(
                axis=2, dtype=U32
            )
            for c in range(4)
        ],
        axis=1,
    )  # (B0, 4, PBL)

    # stripe/top masks in block-local center-aligned coordinates
    wlane = jnp.arange(BW, dtype=jnp.int32)[None, :]
    q_lo = (cen - md)[:, None]
    q_hi = (cen + md)[:, None]
    base_m = jnp.where(
        wlane < (q_lo >> 5), U32(0),
        jnp.where(wlane > (q_lo >> 5), FULL, FULL << (q_lo & 31).astype(U32)),
    )
    top_m = jnp.where(
        wlane > (q_hi >> 5), U32(0),
        jnp.where(wlane < (q_hi >> 5), FULL, FULL >> (31 - (q_hi & 31)).astype(U32)),
    )
    smask = base_m & top_m  # (B0, BW)
    tmask = jnp.where(
        wlane == (q_hi >> 5), U32(1) << (q_hi & 31).astype(U32), U32(0)
    )

    # pack pairs into (programs, SLC sublanes, NB lane-blocks)
    dpad = B - B0

    def padb(x, fill=0):
        return jnp.pad(x, ((0, dpad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)

    def pack_lanes(x, fill=0):
        """(B, BW) per-pair -> (P*SLC, L) blocked rows."""
        x = padb(x, fill).reshape(P, SLC, NB * BW)
        if NB * BW < L:
            x = jnp.pad(
                x, ((0, 0), (0, 0), (0, L - NB * BW)), constant_values=fill
            )
        return x.reshape(P * SLC, L)

    def pack_wide(x):
        """(B, X) per-pair -> (P*SLC, NB*X) blocked rows."""
        X = x.shape[1]
        return padb(x).reshape(P, SLC, NB * X).reshape(P * SLC, NB * X)

    def pack_scalar(v, fill):
        """(B0,) per-pair -> (P*SL, L) broadcast over each block's lanes."""
        vb = jnp.broadcast_to(v[:, None], (B0, BW))
        return pack_lanes(vb, fill)

    ka_p = pack_wide(ka)
    peq_p = pack_wide(peq.reshape(B0, 4 * PBL))
    smask_p = pack_lanes(smask)
    tmask_p = pack_lanes(tmask)
    md_p = pack_scalar(md, 1)
    lena_p = pack_scalar(klena, 0)
    oksz_p = pack_scalar(ok_size, 0)

    inputs = (tab, ka_p, peq_p, smask_p, tmask_p, md_p, lena_p, oksz_p)
    aux = (swap, len_b, klena, klenb, ok_size)
    return inputs, aux


def _call_kernel(inputs, *, B0, LA, LB, la_max, w_max, interpret=False):
    """The pallas_call alone: packed inputs -> packed outputs."""
    d = _dims(B0, LA, LB, la_max, w_max)
    cen, words, L, NB, BW = d["cen"], d["words"], d["L"], d["NB"], d["BW"]
    KA, PBL, SLC, T_pad = d["KA"], d["PBL"], d["SLC"], d["T_pad"]
    cols_max, P = d["cols_max"], d["P"]
    tab, ka_p, peq_p, smask_p, tmask_p, md_p, lena_p, oksz_p = inputs

    grid = (P,)
    out_words, out_scal = pl.pallas_call(
        functools.partial(
            _kernel,
            cols_max=cols_max,
            cen=cen,
            words=words,
            lanes=L,
            nb=NB,
            bw=BW,
            pbl=PBL,
            sl=SLC,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_pad), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((SLC, NB * KA), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SLC, NB * 4 * PBL), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SLC, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SLC, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SLC, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SLC, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SLC, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SLC, 2 * L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SLC, 2 * L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P * SLC, 2 * L), U32),
            jax.ShapeDtypeStruct((P * SLC, 2 * L), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLC, 4 * L), U32),
            pltpu.VMEM((SLC, NB * CHUNK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=110 * P * SLC * cols_max * (L // 128),
            bytes_accessed=P * SLC * (NB * KA + NB * 4 * PBL + 3 * L) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tab, ka_p, peq_p, smask_p, tmask_p, md_p, lena_p, oksz_p)
    return out_words, out_scal


def _post(out_words, out_scal, aux, *, B0, LA, LB, la_max, w_max, ratio):
    """XLA epilogue: goal cells, un-transpose, acceptance thresholds."""
    d = _dims(B0, LA, LB, la_max, w_max)
    cen, L, NB, BW = d["cen"], d["L"], d["NB"], d["BW"]
    SLC, B, P = d["SLC"], d["B"], d["P"]
    swap, len_b, klena, klenb, ok_size = aux
    tab_len = max(la_max, LB, LA) + 2
    _, accept_min_np, _ = _threshold_tables(ratio, tab_len)
    accept_min = jnp.asarray(accept_min_np)

    def unpack_lanes(x):
        """(P*SLC, L) -> (B0, BW) per-pair block rows."""
        return (
            x[:, : NB * BW].reshape(P, SLC, NB, BW).reshape(B, BW)[:B0]
        )

    fVP = unpack_lanes(out_words[:, :L])
    fVN = unpack_lanes(out_words[:, L:])
    S_c = unpack_lanes(out_scal[:, :L])[:, cen >> 5]
    fail_col = unpack_lanes(out_scal[:, L:])[:, cen >> 5]
    failed = fail_col != 0

    # far-row goal (seq_aligner.h:205-212 / bitparallel.py post-loop):
    # D(klena, klena + e) = S_c + cumsum of vertical deltas above center.
    # The captured words are the p-domain state (shr1 of the final VP/VN),
    # so bit q of the final column lives at q-1.
    E = w_max + 1
    e_arr = jnp.arange(E, dtype=jnp.int32)
    q = cen + e_arr - 1
    # bit q of the final-column words, for q in a static range: expand every
    # needed word to its 32 bits (repeat + static per-lane shift) and slice —
    # the take_along_axis form is a real TPU gather, linear in B*E
    assert cen >= 1, cen  # _plan guarantees this; wlo below reads word cen-1
    wlo = (cen - 1) >> 5
    nw = ((cen + E - 2) >> 5) - wlo + 1
    bit_sh = (jnp.arange(nw * 32, dtype=U32) & U32(31))[None, :]
    off = (cen - 1) - wlo * 32

    def _bits(fW):
        rep = jnp.repeat(fW[:, wlo : wlo + nw], 32, axis=1)
        return ((rep >> bit_sh) & U32(1)).astype(jnp.int32)[:, off : off + E]

    vp_b = _bits(fVP)
    vn_b = _bits(fVN)
    deltas = jnp.where(e_arr[None, :] > 0, vp_b - vn_b, 0)
    vals = S_c[:, None] + jnp.cumsum(deltas, axis=1)
    valid_e = e_arr[None, :] <= (klenb - klena)[:, None]
    rowm = jnp.where(valid_e, vals, INF32)
    kS = jnp.argmin(rowm, axis=1).astype(jnp.int32)  # first minimum
    costS = jnp.take_along_axis(rowm, kS[:, None], axis=1)[:, 0]
    far_len = klena + kS

    # un-transpose (long case: matlen_a = far argmin, matlen_b = len_b)
    matlen_a = jnp.where(swap, far_len, klena)
    matlen_b = jnp.where(swap, klena, far_len)
    cost = costS
    diag_cost = jnp.where(swap, -1, S_c)

    accept = (
        (ok_size != 0)
        & ~failed
        & (klena >= 1)
        & (matlen_b >= accept_min[jnp.clip(len_b, 0, tab_len)])
        & (cost < INF32)
    )
    # reference-equivalent rows: the serial DP aborts at the early-failure
    # row (seq_aligner.h:185-187); the kernel itself runs min(len_a, len_b)
    # columns (transpose normalization) at 32-column early-exit granularity
    rows = jnp.where(ok_size != 0, jnp.where(failed, fail_col, klena), 0)
    return BatchScores(accept, cost, matlen_a, matlen_b, diag_cost, rows)


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "w_max", "ratio", "maxn", "maxm", "interpret"),
)
def batch_score_bitpallas(
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
    """Bit-parallel Pallas equivalent of scan.batch_score (same contract)."""
    B0, LA, LB = a.shape[0], a.shape[1], b.shape[1]
    inputs, aux = _prep(
        a, la, b, lb, la_max=la_max, w_max=w_max, ratio=ratio,
        maxn=maxn, maxm=maxm,
    )
    out_words, out_scal = _call_kernel(
        inputs, B0=B0, LA=LA, LB=LB, la_max=la_max, w_max=w_max,
        interpret=interpret,
    )
    return _post(
        out_words, out_scal, aux, B0=B0, LA=LA, LB=LB,
        la_max=la_max, w_max=w_max, ratio=ratio,
    )


# Staged wrappers for bench.py's roofline split (NOT production paths):
# prep-only (returns the packed kernel inputs) and kernel-only (consumes
# them), so kernel-only time can be measured on device-resident prepped
# inputs without the XLA prologue/epilogue in the same dispatch.


@functools.partial(
    jax.jit, static_argnames=("la_max", "w_max", "ratio", "maxn", "maxm")
)
def bitpallas_prep_only(
    a, la, b, lb, *, la_max, w_max,
    ratio=Constants.MAXR, maxn=Constants.ALIGNER_MAXN, maxm=Constants.ALIGNER_MAXM,
):
    inputs, _ = _prep(
        a, la, b, lb, la_max=la_max, w_max=w_max, ratio=ratio,
        maxn=maxn, maxm=maxm,
    )
    return inputs


@functools.partial(
    jax.jit, static_argnames=("B0", "LA", "LB", "la_max", "w_max")
)
def bitpallas_kernel_only(inputs, *, B0, LA, LB, la_max, w_max):
    return _call_kernel(inputs, B0=B0, LA=LA, LB=LB, la_max=la_max, w_max=w_max)
