"""Pallas TPU kernel: banded Myers bit-parallel screening (~32 cells/lane).

The production screening kernel. Same contract and bit-identical decisions
as wavefront.batch_score_pallas / scan.batch_score (the reference's banded
DP, seq_aligner.h:151-213), but each VPU lane holds 32 band cells as bits
in Myers/Hyyrö delta encoding (exactness root: align/bitparallel.py, whose
word-vectorized algebra this kernel executes; see its derivation notes).

Design (all parity-critical choices are pinned by tests/test_bitwave.py):

  * 8 alignments per grid program, one per sublane; each pair's band
    stripe is a multiword bitvector across lanes (word p>>5, bit p&31);
    one column of the DP costs ~O(WORDS/32) of the row kernel's work.

  * transpose normalization: edit distance is symmetric and the band and
    the early-failure diagonal cells are orientation-invariant, so pairs
    with len_a > len_b are scored as (b, a). That removes the far-column
    goal scan (seq_aligner.h:196-204) entirely — the kernel only ever
    computes the len_a <= len_b case, and the far-row goal
    (seq_aligner.h:205-212) is recovered OUTSIDE the kernel from the final
    column's vertical deltas (validated exhaustively vs the banded DP).

  * center-aligned bit coordinates: row j at column i lives at bit
    q = CEN + (j - i) with CEN static (CEN % 32 == 16), so the center
    score bits (q = CEN-1, CEN), the border-row injection (q = CEN - i),
    and the PM window offset (exactly i) are uniform across pairs; only
    the stripe mask [CEN-md, CEN+md] and the top-bit mask (CEN+md) vary
    per pair, and those are precomputed host-side tensors.

  * 32-column unrolled blocks: the while_loop advances 32 columns per
    iteration (block k covers i in [32k, 32k+31]), so the PEQ window
    refresh is unconditional once per block, every in-word bit offset is
    STATIC inside the unrolled body, and scalar loop overhead amortizes
    over 32 columns — this is what makes the column loop VPU-bound
    instead of control-bound.

  * the Myers addition's cross-word carries resolve with a Kogge-Stone
    prefix over (generate, propagate) word masks, using X subset-of VPp
    to shorten the generate term; every word-shift is a lane roll (tpu
    dynamic_rotate, int32 lanes — uint32 is bitcast around rolls) with
    wrapped lanes re-zeroed.

  * a while_loop exits as soon as every pair in the program is finished
    (early-failed / size-rejected / past its last column), at block
    granularity.

Outputs per pair: final-column VP/VN words + the center score; the XLA
wrapper computes goal cells, un-transposes, and applies the acceptance
thresholds (integer tables precomputed on host in float64 — no float32
on device, matching scan.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Constants
from .scan import BatchScores, _threshold_tables

INF32 = np.int32(1 << 28)
CHUNK = 128
UNROLL = 32
U32 = jnp.uint32
FULL = np.uint32(0xFFFFFFFF)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(w_max: int):
    """Static geometry: center bit, word count, padded lane width."""
    cen = 16 if w_max <= 16 else _round_up(w_max - 16, 32) + 16
    words = (cen + w_max) // 32 + 2  # stripe top + carry-overflow slack
    lanes = _round_up(words + 1, CHUNK)
    return cen, words, lanes


def _roll(x, sh):
    """Lane roll (right rotation by sh) of a uint32 array; int32-only op."""
    return pltpu.bitcast(pltpu.roll(pltpu.bitcast(x, jnp.int32), sh, axis=1), U32)


def _kernel(
    tab_ref,    # (1, T_pad) int32 thresholds floor(i*R), indexed by column
    ka_ref,     # (SL, KA) int32 codes of kernel-a, PRE-SHIFTED: ka[t]=a[t-1]
    peq_ref,    # (SL, 4*PBL) uint32 per-letter match bits of kernel-b
    smask_ref,  # (SL, L) uint32 stripe mask [CEN-md, CEN+md]
    tmask_ref,  # (SL, L) uint32 top bit CEN+md
    md_ref,     # (SL, 1) int32
    lena_ref,   # (SL, 1) int32 kernel len_a (= min(len_a, len_b))
    oksz_ref,   # (SL, 1) int32 size-accept flag
    words_ref,  # out (SL, 2L) uint32: [final VP | final VN]
    scal_ref,   # out (SL, 128) int32: lane 0 = center score, 1 = failed
    pwin_ref,   # scratch (SL, 4*L) uint32 PEQ windows (letter-major)
    awin_ref,   # scratch (SL, CHUNK) int32
    twin_ref,   # scratch (1, CHUNK) int32
    *,
    cols_max: int,
    cen: int,
    words: int,
    lanes: int,
    pbl: int,
    sublanes: int,
):
    L = lanes
    SL = sublanes
    WC = cen >> 5  # word holding bits CEN-1 (bit 15) and CEN (bit 16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SL, L), 1)
    up_masks = {}
    sh = 1
    while sh < words:
        up_masks[sh] = (lane >= sh).astype(U32) * FULL
        sh <<= 1
    if 1 not in up_masks:
        up_masks[1] = (lane >= 1).astype(U32) * FULL
    not_last = (lane < L - 1).astype(U32) * FULL

    def shr1(x):
        hi = _roll(x, L - 1) & not_last  # word v <- v+1 (wrap zeroed)
        return (x >> U32(1)) | (hi << U32(31))

    def shl1(x):
        up = _roll(x, 1) & up_masks[1]  # word v <- v-1 (lane 0 zeroed)
        return (x << U32(1)) | (up >> U32(31))

    def add_carry(x, y):
        """x + y with carry lookahead; requires x & y == x (subset)."""
        s = x + y
        # per-word carry-out/propagate masks (0 / FFFFFFFF)
        gen = pltpu.bitcast((x | (y & ~s)) >> U32(31), jnp.int32) * jnp.int32(-1)
        prop = jnp.where(
            pltpu.bitcast(s, jnp.int32) == jnp.int32(-1), jnp.int32(-1), 0
        )
        sh = 1
        while sh < words:
            m = pltpu.bitcast(up_masks[sh], jnp.int32)
            gen = gen | (prop & (pltpu.roll(gen, sh, axis=1) & m))
            prop = prop & (pltpu.roll(prop, sh, axis=1) & m)
            sh <<= 1
        cin = pltpu.bitcast(
            pltpu.roll(gen, 1, axis=1) & pltpu.bitcast(up_masks[1], jnp.int32), U32
        ) & U32(1)
        return s + cin

    def pick_wc(x):
        """(SL, 1) int32 word WC of each sublane's bitvector."""
        if WC == 0:
            return pltpu.bitcast(x[:, 0:1], jnp.int32)
        return pltpu.bitcast(_roll(x, L - WC)[:, 0:1], jnp.int32)

    smask = smask_ref[:]
    tmask = tmask_ref[:]
    md = md_ref[:]
    lena = lena_ref[:]
    oksz = oksz_ref[:]

    nblk4 = 4  # awin/twin refresh period in blocks (4 * 32 = 128 columns)

    def loop_cond(carry):
        k, VP, VN, S_c, failed, fVP, fVN = carry
        i0 = k * UNROLL
        done = jnp.minimum(failed + (lena < i0).astype(jnp.int32) + (1 - oksz), 1)
        return (i0 <= cols_max) & (jnp.min(done) == 0)

    def block(carry):
        k, VP, VN, S_c, failed, fVP, fVN = carry
        i0 = k * UNROLL

        # PEQ window for bits [32k, 32k + 32L): one rotate per letter/block
        for c in range(4):
            pwin_ref[:, c * L : (c + 1) * L] = _roll(
                peq_ref[:, c * pbl : (c + 1) * pbl], pbl - k
            )[:, :L]

        @pl.when(jax.lax.rem(k, nblk4) == 0)
        def _refresh_a():
            b0 = pl.multiple_of(i0, CHUNK)
            awin_ref[:] = ka_ref[:, pl.ds(b0, CHUNK)]
            twin_ref[:] = tab_ref[:, pl.ds(b0, CHUNK)]

        off = (i0 - (i0 // CHUNK) * CHUNK).astype(jnp.int32)
        aiw = pltpu.roll(awin_ref[:], CHUNK - off, axis=1)  # lanes r: a[i0+r-1]
        thw = pltpu.roll(twin_ref[:], CHUNK - off, axis=1)  # lanes r: thr[i0+r]

        p0 = pwin_ref[:, 0 * L : 1 * L]
        p1 = pwin_ref[:, 1 * L : 2 * L]
        p2 = pwin_ref[:, 2 * L : 3 * L]
        p3 = pwin_ref[:, 3 * L : 4 * L]

        for r in range(UNROLL):
            i = i0 + r
            active = i <= lena
            if r == 0:
                active = active & (k > 0)  # block 0 starts at column 1

            ai = aiw[:, r : r + 1]
            thr = thw[0:1, r : r + 1]
            bit0 = (ai & 1) == 1
            bit1 = (ai >> 1) == 1
            sel = jnp.where(bit1, jnp.where(bit0, p3, p2), jnp.where(bit0, p1, p0))
            if r == 0:
                PM = sel & smask
            else:
                sel_hi = _roll(sel, L - 1)  # wrap garbage masked by smask
                PM = ((sel >> U32(r)) | (sel_hi << U32(32 - r))) & smask

            VPp = shr1(VP) | tmask
            VNp = shr1(VN)

            X = PM & VPp
            SUM = add_carry(X, VPp)
            Xh = (SUM ^ VPp) | PM
            Ph = VNp | ~(Xh | VPp)
            Mh = VPp & Xh

            # border row j=0 at q = CEN - i while i <= md; (CEN - i) & 31 is
            # static inside the block, the word index is traced
            qb = cen - i
            bbit = U32(1 << ((cen - r) & 31))
            bmask = jnp.where((lane == (qb >> 5)) & (i <= md), bbit, U32(0))
            Ph = (Ph | bmask) & smask
            Mh = (Mh & ~bmask) & smask

            Phs = shl1(Ph)
            Mhs = shl1(Mh)
            Xv = PM | VNp
            VP_new = (Mhs | ~(Xv | Phs)) & smask
            VN_new = Phs & Xv & smask

            # center score D(i,i): bits CEN-1 (dh of Ph/Mh), CEN (dv of new)
            phw = pick_wc(Ph)
            mhw = pick_wc(Mh)
            vpw = pick_wc(VP_new)
            vnw = pick_wc(VN_new)
            dh = ((phw >> 15) & 1) - ((mhw >> 15) & 1)
            dv = ((vpw >> 16) & 1) - ((vnw >> 16) & 1)
            S_c_new = S_c + dh + dv

            fail_now = (active & (i > 10) & (S_c_new > thr)).astype(jnp.int32)
            failed = jnp.maximum(failed, fail_now)

            cap = lena == i
            fVP = jnp.where(cap, VP_new, fVP)
            fVN = jnp.where(cap, VN_new, fVN)
            VP = jnp.where(active, VP_new, VP)
            VN = jnp.where(active, VN_new, VN)
            S_c = jnp.where(active, S_c_new, S_c)

        return k + 1, VP, VN, S_c, failed, fVP, fVN

    zeros = jnp.zeros((SL, 1), jnp.int32)
    zvec = jnp.zeros((SL, L), U32)
    _, _, _, S_c, failed, fVP, fVN = jax.lax.while_loop(
        loop_cond, block, (jnp.int32(0), smask, zvec, zeros, zeros, zvec, zvec)
    )

    words_ref[:, :L] = fVP
    words_ref[:, L:] = fVN
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (SL, 128), 1)
    out = jnp.where(lane_out == 0, S_c, 0)
    out = jnp.where(lane_out == 1, failed, out)
    scal_ref[:] = out


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
    B0 = a.shape[0]
    LA = a.shape[1]
    LB = b.shape[1]
    SL = 32  # pairs per program: multi-vreg ops amortize Mosaic's per-op cost
    cen, words, L = _plan(w_max)
    cols_max = min(LB, la_max)  # kernel-a = min side
    KA = _round_up(cols_max + UNROLL + 1, CHUNK)
    KB = max(LA, LB)
    PBL = _round_up(-(-(KB + cen + w_max + 2) // 32) + 1, CHUNK)
    T_pad = KA
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

    # PEQ: bit t of letter c = (kb[t - cen - 1] == c), rows in [0, klenb)
    t_idx = jnp.arange(PBL * 32, dtype=jnp.int32)
    src = t_idx - cen - 1
    bch = jnp.take_along_axis(
        kb, jnp.broadcast_to(jnp.clip(src, 0, KB - 1)[None, :], (B0, PBL * 32)), axis=1
    )
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
    ).reshape(B0, 4 * PBL)

    # stripe/top masks in center-aligned coordinates
    wlane = jnp.arange(L, dtype=jnp.int32)[None, :]
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
    smask = base_m & top_m
    tmask = jnp.where(
        wlane == (q_hi >> 5), U32(1) << (q_hi & 31).astype(U32), U32(0)
    )

    # pad batch to a sublane multiple; padding rows are size-rejected
    B = _round_up(max(B0, 1), SL)
    dpad = B - B0

    def padb(x, fill=0):
        return jnp.pad(x, ((0, dpad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)

    grid = (B // SL,)
    out_words, out_scal = pl.pallas_call(
        functools.partial(
            _kernel,
            cols_max=cols_max,
            cen=cen,
            words=words,
            lanes=L,
            pbl=PBL,
            sublanes=SL,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, KA), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 4 * PBL), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SL, 2 * L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 2 * L), U32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SL, 4 * L), U32),
            pltpu.VMEM((SL, CHUNK), jnp.int32),
            pltpu.VMEM((1, CHUNK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=110 * B * cols_max * (L // 128),
            bytes_accessed=B * (KA + 4 * PBL + 3 * L) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        tab,
        padb(ka),
        padb(peq),
        padb(smask),
        padb(tmask),
        padb(md[:, None], 1),
        padb(klena[:, None], 0),
        padb(ok_size[:, None], 0),
    )

    fVP = out_words[:B0, :L]
    fVN = out_words[:B0, L:]
    S_c = out_scal[:B0, 0]
    failed = out_scal[:B0, 1] != 0

    # far-row goal (seq_aligner.h:205-212 / bitparallel.py post-loop):
    # D(klena, klena + e) = S_c + cumsum of vertical deltas above center
    E = w_max + 1
    e_arr = jnp.arange(E, dtype=jnp.int32)
    q = cen + e_arr
    widx = jnp.broadcast_to((q >> 5)[None, :], (B0, E))
    vp_b = (
        (jnp.take_along_axis(fVP, widx, axis=1) >> (q & 31)[None, :].astype(U32)) & 1
    ).astype(jnp.int32)
    vn_b = (
        (jnp.take_along_axis(fVN, widx, axis=1) >> (q & 31)[None, :].astype(U32)) & 1
    ).astype(jnp.int32)
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
    return BatchScores(accept, cost, matlen_a, matlen_b, diag_cost, len_a)
