"""Typed configuration for the assembly engine.

Replaces the reference's split between compile-time #defines
(reference common.h:31-39, spaced_seed.cpp:35-39) and getopt CLI flags
(spaced_seed.cpp:47-61) with one dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


class Constants:
    """Hard limits mirroring reference common.h:31-39."""

    #: max length of genome allowed (common.h:31)
    MAX_SEQ_LEN = 800_000
    #: max length of segment reads processed (common.h:33)
    MAX_READ_LEN = 20_000
    #: max difference (distance) allowed between overlapped reads (common.h:35)
    MAX_DIFF_LEN = 6_000
    #: max ratio of difference (common.h:37)
    MAXR = 0.3
    #: min length of aligned region to justify overlap (common.h:39)
    OVERLAP_MIN = 64
    #: reads shorter than this are ignored (spaced_seed.cpp:36)
    SEQ_THRESHOLD = 500
    #: seed (k-mer) width in bases (dna_seq.h:26)
    SEED_LEN = 16
    #: aligner template bound MAXN = MAX_READ_LEN + MAX_DIFF_LEN (seq_aligner.h:260)
    ALIGNER_MAXN = MAX_READ_LEN + MAX_DIFF_LEN
    #: aligner template bound MAXM = MAX_DIFF_LEN (seq_aligner.h:260)
    ALIGNER_MAXM = MAX_DIFF_LEN
    #: majority threshold used by evolve (ref_seq.h:326,335)
    VOTE_RATIO = 0.5


@dataclasses.dataclass
class AssemblyConfig:
    """One config object covering the reference CLI flags + #defines.

    Flag mapping (reference spaced_seed.cpp:47-61):
      -f file   -> initial_ref_path (text line + weight line)
      -r ratio  -> ratio
      -d file   -> dump_path
      -m n      -> max_round
      -t n      -> max_trial
      -l        -> locked
    """

    # alignment
    ratio: float = Constants.MAXR
    overlap_min: int = Constants.OVERLAP_MIN
    aligner_maxn: int = Constants.ALIGNER_MAXN
    aligner_maxm: int = Constants.ALIGNER_MAXM

    # read filtering (spaced_seed.cpp:334)
    min_read_len: int = Constants.SEQ_THRESHOLD   # strict >
    max_read_len: int = Constants.MAX_READ_LEN    # strict <

    # round loop
    max_round: Optional[int] = None               # None = unbounded (INT_MAX)
    max_trial: int = 32                           # seeding trials per read
    locked: bool = False                          # freeze reference (no vote/grow)
    vote_ratio: float = Constants.VOTE_RATIO

    # reference init
    initial_ref_path: Optional[str] = None        # -f file (line1 seq, line2 weight)
    rng_seed: Optional[int] = None                # None = nondeterministic like srand(time(0))

    # pattern schedule: "random" mirrors the reference rand() pick
    # (spaced_seed.cpp:412); "roundrobin" is the deterministic schedule used
    # by the parity harness.
    pattern_schedule: str = "random"

    # engine: "exact" = sequential host engine (bit-parity with the C++
    # semantics); "batch" = TPU batched screening with end-of-round commit.
    engine: str = "exact"

    # batch engine knobs
    batch_size: int = 128            # alignments screened per device batch
    bucket_max_candidates: int = 64  # max index hits expanded per (read, trial)
    # commit interior alignments from the device traceback pass (edits
    # computed on-device); boundary-capable alignments always take the
    # sequential host path to preserve growth semantics
    device_traceback: bool = True
    # materialize screening batches on device (upload reads once, gather
    # windows/segments on-chip; assemble/gather.py) — falls back to host
    # packing for multi-device sharding or oversized read sets
    device_materialize: bool = True
    # drop same-diagonal duplicate candidates before screening: trials
    # (j, r) and (j+k, r+k) of one read probe the SAME overlap, and the
    # reference only ever *commits* the first success anyway
    # (spaced_seed.cpp:424-439 stops at the first accepted try) — keeping
    # one probe per (read, dir, diagonal) cuts screening work 2-10x on
    # high-coverage boundaries with no effect in practice (the kept probe
    # is the highest-priority one, which is also the one the reference
    # would commit)
    dedupe_diagonals: bool = True

    # screening prefilter: score only the first prefilter_len bases of each
    # candidate at the looser prefilter_ratio and full-screen just the
    # survivors. At E. coli scale nearly every candidate is a random
    # spaced-seed collision; the full-band DP on those dominates the round.
    # Empirics (window 128, banded DP cost/base): true overlaps even in the
    # worst 15%-read-vs-15%-edge case stay <= 0.42 (p99 0.37) while random
    # pairs stay >= 0.48, so 0.45 separates cleanly. Applies only to
    # device-fused rounds with >= prefilter_min_batch candidates (small
    # runs, tests, and host-path rounds never prefilter); prefilter_len=0
    # disables entirely.
    prefilter_len: int = 128
    prefilter_ratio: float = 0.45
    # run the prefilter whenever a device-fused round has at least this
    # many candidates. 1024 (was 8192 in r2): the pass costs one extra tiny
    # launch, and at 4.6 Mb scale steady-state rounds carry ~6-7k candidates
    # — just under the old threshold — so every full-band launch was paying
    # the few true overlaps' full column count for thousands of random
    # collisions (measured: screen 5.4 s/round -> ~0.6 s with the pass on)
    prefilter_min_batch: int = 1024

    # stall recovery (extension beyond the reference, which terminates as
    # soon as every pattern fails in a row — spaced_seed.cpp:441-447): up
    # to edge_retreat times, trim the single-read consensus fringe
    # (ConsensusRef.retreat_edges) and keep assembling so a different read
    # can re-extend the edge with fresh errors. 0 = reference behavior.
    edge_retreat: int = 0
    edge_retreat_min_total: int = 2
    # escalation: when a stall's weak-fringe trim removes nothing (the edge
    # is multi-read-supported but still unmatchable — r3's first CLR run
    # terminated at 96.8 kb with 63/64 retreats unused this way), trim this
    # many cells off each end instead so different reads must re-extend.
    # 0 disables the escalation (retreat stops at the reference-plus-fringe
    # behavior).
    edge_retreat_bite: int = 0
    # retreats are only worth their rounds on a contig that has actually
    # grown: a junk-read restart (multi-contig mode) stalls at ~read
    # length and would otherwise burn the whole retreat budget a few
    # wasted rounds at a time. Contigs shorter than this stop at the
    # first full pattern sweep instead. 0 = retreat at any length.
    edge_retreat_min_len: int = 0
    # stop after this many CONSECUTIVE retreats that produced no match at
    # all before the next stall: once the survivors are genuinely
    # unalignable (the r4 whole-genome run ended with 5 junk reads and a
    # 186-retreat budget that could only nibble the contig edges), more
    # retreats are pure waste. 0 = retreat until the budget is spent.
    edge_retreat_fruitless: int = 0
    # run the two boundary regions' sequential host commits in two
    # threads (the ctypes native DP releases the GIL). The regions are
    # independent: candidates come from the boundary-only seedmap, each
    # side's alignments span <= seedmap window + read length, and growth
    # at post/pre comes only from its own side — so per-side order (the
    # semantics carrier) is preserved and results are deterministic
    # (tests/test_batch.py::test_parallel_commit_equivalence). MEASURED
    # NEGATIVE on the 2-core tunnel host (r4, rounds 301-380 of the
    # steady run): 18.8 -> 20.3 ms/align — the ~19 ms per align is
    # glue-dominated (accessor copies, elect numpy, Python) and matches
    # concentrate on the actively-growing edge, so the split buys
    # nothing there. OFF by default; the mechanism is kept (tested) for
    # many-core hosts where the balance differs.
    parallel_commit: bool = False

    # capacity: max consensus length (reference MAX_SEQ_LEN, common.h:31);
    # unlike the reference's compile-time cap this is a runtime knob, so
    # E. coli-scale genomes just pass a bigger value
    max_seq_len: int = Constants.MAX_SEQ_LEN

    # checkpoint / resume (SURVEY.md §5: the reference's manual -f resume
    # made into a real checkpoint)
    checkpoint_path: Optional[str] = None   # save here every checkpoint_every rounds + at end
    checkpoint_every: int = 1
    resume_path: Optional[str] = None

    # observability
    dump_path: Optional[str] = None
    metrics_path: Optional[str] = None      # JSONL per-round metrics
    profile_dir: Optional[str] = None       # jax.profiler trace directory
    verbose: bool = True

    # quirk compatibility with reference bugs (SURVEY.md §7 "hard parts"):
    # seed_at() pos%4==0 fast path reads the wrong byte offset (dna_seq.h:64).
    # True replicates the bug for bit-parity with the C++ binary.
    quirk_seed_at: bool = False
    # The reference reads the -f initial reference with fgets and keeps the
    # trailing '\n' as a base (C2I('\n') == 3 == 'T'; spaced_seed.cpp:198-203).
    # True replicates that extra bogus base for bit-parity.
    quirk_init_newline: bool = False
    # The reference's early-failure test reads stale cells of its persistent
    # DP matrix for rows past len_b (seq_aligner.h:81,185-187 — undefined
    # behavior whose outcome depends on ALL previous alignments). True runs
    # the DP on a byte-layout emulation of that matrix (native core only).
    quirk_stale_dp: bool = False
