"""Batch (TPU) assembly engine.

Redefines the reference's sequential round (spaced_seed.cpp:410-453) into a
screen-then-commit round that keeps the DP work on the accelerator:

  Phase A (device): expand every surviving read's seeding trials into
    candidate (read, trial j, direction, ref offset) tuples against the
    ROUND-START reference, bucket them by segment size, and score them all
    with the batched banded-DP kernel (Pallas on TPU, lax.scan elsewhere).

  Phase B (host, native): for each read with accepted candidates, in read
    order, take its first candidate in trial-priority order (j asc, forward
    before backward, bucket insertion order) and commit it through the
    sequential try_align path — exact votes + boundary growth against the
    CURRENT (possibly mid-phase-grown) reference, matching the reference's
    mid-round growth semantics for everything that commits.

Documented divergence from the exact engine: candidate discovery sees the
round-start reference, so a read that the reference would only catch after
mid-round growth is simply caught in a later round. Votes are commutative
tensor updates either way. Phase A is what shards across chips
(parallel/sharded.py); Phase B touches only the handful of accepted reads.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, TextIO

import numpy as np

from ..align import exact_align
from ..align.screen import score_batch, size_bucket
from ..codec import dna
from ..config import AssemblyConfig, Constants
from ..consensus import ConsensusRef
from ..index import SeedIndex, build_seedmap
from .driver import RoundStats, init_reference
from .reads import ReadStore

SEED_LEN = Constants.SEED_LEN


@dataclasses.dataclass
class Candidate:
    read: int      # index into surviving read list
    j: int         # trial number
    forward: bool
    r_offset: int  # reference position (already direction-adjusted)
    rank: int      # position within the index bucket


class TrialSeedCache:
    """Per-read raw trial seeds, computed once — only the pattern mask
    changes between rounds, so the whole per-round candidate discovery
    becomes (seeds & pattern) + one vectorized binary search.

    Column layout interleaves [fwd j=0, bwd j=0, fwd j=1, bwd j=1, ...] so a
    row scan in column order reproduces the reference's trial priority
    (spaced_seed.cpp:424-426)."""

    def __init__(self, reads: ReadStore, cfg: AssemblyConfig):
        T = cfg.max_trial
        N = len(reads)
        self.seeds = np.zeros((N, 2 * T), dtype=np.uint32)
        self.valid = np.zeros((N, 2 * T), dtype=bool)
        for i in range(N):
            codes = reads.codes(i)
            slen = len(codes)
            fpos = np.arange(min(T, max(0, slen - SEED_LEN + 1)), dtype=np.int64)
            bpos = slen - SEED_LEN - np.arange(T, dtype=np.int64)
            bpos = bpos[bpos >= 0][: T]
            if cfg.quirk_seed_at:
                fs = np.array(
                    [reads.quirk_seed(i, int(p)) for p in fpos], dtype=np.uint32
                )
                bs = np.array(
                    [reads.quirk_seed(i, int(p)) for p in bpos], dtype=np.uint32
                )
            else:
                fs = dna.encode_seeds(codes, fpos) if len(fpos) else np.empty(0, np.uint32)
                bs = dna.encode_seeds(codes, bpos) if len(bpos) else np.empty(0, np.uint32)
            # validity includes the segment-length floor (s_len = slen - j)
            j_idx = np.arange(T)
            s_len_ok = (slen - j_idx) >= cfg.overlap_min
            self.seeds[i, 0 : 2 * len(fs) : 2] = fs
            self.valid[i, 0 : 2 * len(fs) : 2] = s_len_ok[: len(fs)]
            self.seeds[i, 1 : 2 * len(bs) + 1 : 2] = bs
            self.valid[i, 1 : 2 * len(bs) + 1 : 2] = s_len_ok[: len(bs)]


def expand_candidates(
    reads: ReadStore,
    surviving: list[int],
    index: SeedIndex,
    pattern: int,
    cfg: AssemblyConfig,
    cache: TrialSeedCache,
) -> list[Candidate]:
    """All seeding trials for all surviving reads, in trial-priority order
    per read. Vectorized: mask the cached raw seeds, batch binary-search the
    index, then expand only the hits."""
    if not surviving:
        return []
    cap = cfg.bucket_max_candidates
    alive = np.asarray(surviving)
    seeds = cache.seeds[alive] & np.uint32(pattern)
    valid = cache.valid[alive] & (seeds != 0)
    lo, cnt = index.lookup_batch(seeds.reshape(-1))
    cnt = cnt.reshape(seeds.shape) * valid
    lo = lo.reshape(seeds.shape)

    out: list[Candidate] = []
    hit_rows, hit_cols = np.nonzero(cnt)
    for ridx, col in zip(hit_rows.tolist(), hit_cols.tolist()):
        j = col >> 1
        forward = (col & 1) == 0
        n = min(int(cnt[ridx, col]), cap)
        start = int(lo[ridx, col])
        for rank in range(n):
            r = int(index.positions[start + rank]) + (
                0 if forward else SEED_LEN - 1
            )
            out.append(Candidate(ridx, j, forward, r, rank))
    return out


class BatchAssembler:
    def __init__(
        self,
        cfg: AssemblyConfig,
        reads: ReadStore,
        patterns: list[int],
        ref: Optional[ConsensusRef] = None,
        dump: Optional[TextIO] = None,
    ):
        if not patterns:
            raise ValueError("no seed patterns")
        self.cfg = cfg
        self.reads = reads
        self.patterns = patterns
        self.rng = np.random.default_rng(cfg.rng_seed)
        self.ref = ref if ref is not None else init_reference(cfg, reads, self.rng)
        self.dump = dump
        self.surviving = list(range(len(reads)))
        self.nfailure = 0
        self.nround = 0
        self.dp_cells_total = 0
        self.history: list[RoundStats] = []
        self._aligner = partial(exact_align, ratio=cfg.ratio)
        self._mesh = None
        self._trial_cache = TrialSeedCache(reads, cfg)
        self._device_builder = None  # lazy (assemble/gather.py)

    def _pick_pattern(self) -> int:
        if self.nfailure != 0:
            return self.patterns[self.nfailure - 1]
        if self.cfg.pattern_schedule == "roundrobin":
            return self.patterns[(self.nround - 1) % len(self.patterns)]
        return self.patterns[int(self.rng.integers(0, len(self.patterns)))]

    # ------------------------------------------------------------ phase A

    def _score(self, a_mat, la, b_mat, lb, LA, W):
        """Score one bucket batch — sharded over all local devices when more
        than one is available (1-D dp mesh, tests/test_sharding.py proves
        shard-count invariance), single-device kernel otherwise."""
        import jax

        from ..align.screen import screening_backend

        n_dev = len(jax.devices())
        B = len(la)
        if n_dev > 1 and B >= n_dev:
            from ..align.scan import BatchScores
            from ..parallel import make_mesh, sharded_screen

            if self._mesh is None:
                self._mesh = make_mesh()
            # 64 alignments per device keeps the per-device batch on the
            # bit-parallel kernel's sublane-group quantum; the geometric
            # ladder bounds the number of distinct shapes the sharded jit
            # ever compiles (see align/screen.py)
            from ..align.screen import ladder_size

            pad = ladder_size(B, 64 * n_dev) - B
            if pad:
                a_mat = np.pad(a_mat, ((0, pad), (0, 0)))
                b_mat = np.pad(b_mat, ((0, pad), (0, 0)))
                la = np.pad(la, (0, pad), constant_values=1)
                lb = np.pad(lb, (0, pad), constant_values=1)
            backend = screening_backend()
            res = sharded_screen(
                self._mesh, a_mat, la, b_mat, lb,
                la_max=LA, w_max=W, ratio=self.cfg.ratio,
                backend=backend if backend in ("pallas", "bitpallas") else "scan",
            )
            if pad:
                res = BatchScores(*(x[:B] for x in res))
            return res
        return score_batch(a_mat, la, b_mat, lb, la_max=LA, w_max=W, ratio=self.cfg.ratio)

    def _geometry(self, cands: list[Candidate]):
        """Per-candidate segment/reference lengths vs the round-start ref."""
        ref = self.ref
        seg_len = np.zeros(len(cands), dtype=np.int64)
        ref_len = np.zeros(len(cands), dtype=np.int64)
        for n, c in enumerate(cands):
            i = self.surviving[c.read]
            slen = self.reads.length(i)
            # fwd: segment = read[j:]; bwd: segment = read[:slen-j] reversed
            seg_len[n] = slen - c.j
            p = ref.beg + c.r_offset
            ref_len[n] = (ref.post - p) if c.forward else (p - ref.pre + 1)
        return seg_len, ref_len

    def _materialize(self, cands, idxs, seg_len, ref_len, LB, LA):
        """Pack candidate (ref, seg) code matrices for a device batch."""
        ref = self.ref
        B = len(idxs)
        a_mat = np.zeros((B, LA), dtype=np.uint8)
        b_mat = np.zeros((B, LB), dtype=np.uint8)
        la = np.zeros(B, dtype=np.int32)
        lb = np.zeros(B, dtype=np.int32)
        for bi, n in enumerate(idxs):
            c = cands[n]
            i = self.surviving[c.read]
            codes = self.reads.codes(i)
            if c.forward:
                seg = codes[c.j :]
            else:
                seg = codes[: len(codes) - c.j][::-1]
            p = ref.beg + c.r_offset
            need = min(int(ref_len[n]), LA)
            if c.forward:
                a = ref.buf[p : p + need]
            else:
                a = ref.buf[p - need + 1 : p + 1][::-1]
            a_mat[bi, : len(a)] = a
            b_mat[bi, : len(seg)] = seg
            la[bi] = ref_len[n]  # full accessor length (clamped in-kernel)
            lb[bi] = len(seg)
        # clamp la to what we materialized: the kernel's len_a =
        # min(la, lb+md) <= LB + W + 1 = LA, so `need` rows always cover it
        la = np.minimum(la, LA).astype(np.int32)
        return a_mat, la, b_mat, lb

    def _device_batch(self, cands, idxs, ref_len, LB, LA):
        """Materialize the screening batch on device (assemble/gather.py):
        only six int32s per candidate cross the host->device link instead
        of LA+LB codes. Returns None when the host path should be used
        (disabled, multi-device sharding, or reads too large for a dense
        device matrix)."""
        cfg = self.cfg
        if not cfg.device_materialize:
            return None
        import jax

        if len(jax.devices()) > 1 and len(idxs) >= len(jax.devices()):
            return None  # the sharded host path splits batches per device
        if self._device_builder is None:
            from .gather import DeviceBatchBuilder

            self._device_builder = DeviceBatchBuilder(self.reads, cfg)
        builder = self._device_builder
        if not builder.ok:
            return None

        from ..align.screen import ladder_size

        ref = self.ref
        B0 = len(idxs)
        Bp = ladder_size(B0)
        read_row = np.zeros(Bp, np.int32)
        jv = np.full(Bp, int(self.reads.lengths[0]) - 1, np.int32)  # pad: lb=1
        fwd = np.ones(Bp, bool)
        prel = np.zeros(Bp, np.int32)
        la = np.ones(Bp, np.int32)  # pad: la=1
        for bi, n in enumerate(idxs):
            c = cands[n]
            read_row[bi] = self.surviving[c.read]
            jv[bi] = c.j
            fwd[bi] = c.forward
            prel[bi] = ref.beg + c.r_offset - ref.pre
            la[bi] = min(int(ref_len[n]), LA)
        return builder.materialize(ref, read_row, jv, fwd, prel, la, LA, LB)

    def screen(self, cands: list[Candidate]) -> np.ndarray:
        """Device-score all candidates vs the round-start reference.
        Returns a bool accept vector aligned with `cands`."""
        cfg = self.cfg
        accept = np.zeros(len(cands), dtype=bool)
        if not cands:
            self._seg_len = self._ref_len = np.zeros(0, np.int64)
            return accept

        seg_len, ref_len = self._geometry(cands)
        self._seg_len, self._ref_len = seg_len, ref_len

        # one launch per round: a single size bucket covering the largest
        # candidate — per-launch latency dominates on remote links, and the
        # kernel's sublane-wide early exit makes the padding nearly free for
        # shorter, length-sorted groups
        LB, LA, W = size_bucket(int(seg_len.max()), cfg.ratio)
        # sort by segment length (desc) so early-exit groups finish together
        idxs = sorted(range(len(cands)), key=lambda n: -seg_len[n])
        dev = self._device_batch(cands, idxs, ref_len, LB, LA)
        if dev is not None:
            a_mat, la, b_mat, lb = dev
        else:
            a_mat, la, b_mat, lb = self._materialize(
                cands, idxs, seg_len, ref_len, LB, LA
            )
        res = self._score(a_mat, la, b_mat, lb, LA, W)
        acc = np.asarray(res.accept)
        ma = np.asarray(res.matlen_a)
        ok = acc & (ma >= cfg.overlap_min)
        for bi, n in enumerate(idxs):
            accept[n] = bool(ok[bi])
        self.dp_cells_total += int(np.asarray(res.dp_rows).sum()) * (2 * W + 1)
        return accept

    # ------------------------------------------------------------ phase B

    def commit(self, cands: list[Candidate], accept: np.ndarray) -> int:
        """Commit each read's first accepted candidate, in read order.

        Interior alignments (the DP cannot reach the reference boundary:
        ref_len > seg_len + max_dst, so growth is impossible and mid-phase
        growth cannot change the DP) vote straight from the device
        traceback pass. Boundary-capable alignments go through the exact
        sequential try_align (votes + growth vs the CURRENT reference).
        Returns the number of consumed reads."""
        by_read: dict[int, list[int]] = {}
        for n, c in enumerate(cands):
            if accept[n]:
                by_read.setdefault(c.read, []).append(n)
        if not by_read:
            return 0

        seg_len, ref_len = self._seg_len, self._ref_len
        chosen = {ridx: ns[0] for ridx, ns in by_read.items()}

        # interior eligibility in float64 (same max_dst rule as the DP)
        def interior(n):
            sl, rl = int(seg_len[n]), int(ref_len[n])
            md = 1 + int(min(sl, rl) * self.cfg.ratio)
            return rl > sl + md

        tb = {}
        if self.cfg.device_traceback:
            eligible = [n for n in chosen.values() if interior(n)]
            if eligible:
                tb = self._traceback_batch(cands, eligible, seg_len, ref_len)

        consumed = []
        for ridx in sorted(by_read):
            i = self.surviving[ridx]
            codes = self.reads.codes(i)
            n0 = chosen[ridx]
            done = False
            if n0 in tb:
                ops, vals, matlen_a, matlen_b = tb[n0]
                c = cands[n0]
                self.ref.elect(c.r_offset, ops, vals, c.forward)
                if self.dump is not None:
                    seg = codes[c.j :] if c.forward else codes[: len(codes) - c.j][::-1]
                    ref_codes = self.ref.accessor(c.r_offset, c.forward)[:matlen_a]
                    self.dump.write(dna.codes_to_text(ref_codes) + "\n")
                    self.dump.write(dna.codes_to_text(seg[:matlen_b]) + "\n")
                done = True
            if not done:
                for n in by_read[ridx]:
                    c = cands[n]
                    seg = codes[c.j :] if c.forward else codes[: len(codes) - c.j][::-1]
                    res = self.ref.try_align(self._aligner, c.r_offset, seg, c.forward)
                    if res is not None:
                        if self.dump is not None:
                            ref_codes = self.ref.accessor(c.r_offset, c.forward)[: res.matlen_a]
                            self.dump.write(dna.codes_to_text(ref_codes) + "\n")
                            self.dump.write(dna.codes_to_text(seg[: res.matlen_b]) + "\n")
                        done = True
                        break
            if done:
                consumed.append(ridx)
        consumed_set = set(consumed)
        self.surviving = [
            i for r, i in enumerate(self.surviving) if r not in consumed_set
        ]
        return len(consumed)

    def _traceback_batch(self, cands, idxs, seg_len, ref_len):
        """Device traceback for the chosen interior candidates; returns
        {candidate index: (ops, vals, matlen_a, matlen_b)} for those whose
        traceback accepted (it reruns the identical DP, so it always agrees
        with screening; the dict-miss fallback is the host path)."""
        from ..align.screen import ladder_size, pad_batch
        from ..align.traceback import batch_align_traceback

        cfg = self.cfg
        LB, LA, W = size_bucket(int(max(seg_len[n] for n in idxs)), cfg.ratio)
        out = {}
        CHUNK = 32
        for lo in range(0, len(idxs), CHUNK):
            part = idxs[lo : lo + CHUNK]
            a_mat, la, b_mat, lb = self._materialize(
                cands, part, seg_len, ref_len, LB, LA
            )
            # pad the last chunk to CHUNK so the jitted traceback sees one
            # static batch shape per size bucket (no per-round recompiles);
            # bound the scanned rows by this chunk's real max length (the
            # scan's per-step overhead dominates the pass), laddered so the
            # bound itself only takes a few distinct values
            (a_mat, b_mat), la, lb, _ = pad_batch([a_mat, b_mat], la, lb, CHUNK)
            rows = min(LA, ladder_size(int(la.max()), 512))
            res = batch_align_traceback(
                a_mat, la, b_mat, lb, la_max=LA, w_max=W, ratio=cfg.ratio,
                rows_max=rows,
            )
            acc = np.asarray(res.scores.accept)
            ma = np.asarray(res.scores.matlen_a)
            mb = np.asarray(res.scores.matlen_b)
            ops = np.asarray(res.ops)
            vals = np.asarray(res.vals)
            ne = np.asarray(res.nedit)
            for bi, n in enumerate(part):
                if acc[bi] and ma[bi] >= cfg.overlap_min:
                    out[n] = (
                        ops[bi, : ne[bi]],
                        vals[bi, : ne[bi]],
                        int(ma[bi]),
                        int(mb[bi]),
                    )
        return out

    # ------------------------------------------------------------ rounds

    def run_round(self, log: Optional[TextIO] = None) -> RoundStats:
        self.nround += 1
        cells_before = self.dp_cells_total
        pattern = self._pick_pattern()
        index, n_indexed = build_seedmap(self.ref.text(), pattern)
        cands = expand_candidates(
            self.reads, self.surviving, index, pattern, self.cfg, self._trial_cache
        )
        accept = self.screen(cands)
        nmatches = self.commit(cands, accept)

        if nmatches != 0:
            self.nfailure = 0
        else:
            self.nfailure += 1
        if self.nfailure < len(self.patterns):
            self.ref.evolve()

        stats = RoundStats(
            nround=self.nround,
            pattern=pattern,
            seedmap_size=n_indexed,
            ref_len=self.ref.length(),
            nmatches=nmatches,
            ntrials=len(cands),
            nreads_left=len(self.surviving),
            dp_cells=self.dp_cells_total - cells_before,
        )
        self.history.append(stats)
        return stats

    def run(self, out=None, log=None) -> ConsensusRef:
        cfg = self.cfg
        metrics = None
        if cfg.metrics_path:
            from ..utils import MetricsLogger

            metrics = MetricsLogger(path=cfg.metrics_path)
        if cfg.resume_path:
            from .checkpoint import load_checkpoint

            load_checkpoint(cfg.resume_path, self)
        from ..utils import profiled

        profile_ctx = profiled(cfg.profile_dir)
        profile_ctx.__enter__()
        max_round = cfg.max_round if cfg.max_round is not None else 1 << 31
        while self.nround < max_round:
            stats = self.run_round(log=log)
            if log:
                log.write(
                    f"--- batch round {stats.nround}: matches={stats.nmatches} "
                    f"ref_len={stats.ref_len} candidates={stats.ntrials} "
                    f"reads_left={stats.nreads_left}\n"
                )
            if metrics:
                metrics.round(stats)
            if cfg.checkpoint_path and cfg.checkpoint_every and (
                self.nround % cfg.checkpoint_every == 0
            ):
                from .checkpoint import save_checkpoint

                save_checkpoint(cfg.checkpoint_path, self)
            if self.nfailure >= len(self.patterns):
                break
            if out:
                out.write(dna.codes_to_text(self.ref.text()) + "\n")
        if cfg.checkpoint_path:
            from .checkpoint import save_checkpoint

            save_checkpoint(cfg.checkpoint_path, self)
        profile_ctx.__exit__(None, None, None)
        if metrics:
            metrics.close()
        return self.ref
