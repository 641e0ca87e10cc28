"""Batch (screen-then-commit) engine end-to-end checks.

The batch engine redefines round semantics (candidates discovered against
the round-start reference), so its consensus is not bit-equal to the exact
engine's — the tests check full read consumption, determinism, and that the
final consensus is equivalent (aligns to the exact engine's golden result
at sub-percent edit distance)."""

import io
import os

import numpy as np
import pytest

from pacbioassembly_tpu.align import exact_align
from pacbioassembly_tpu.assemble import ReadStore
from pacbioassembly_tpu.assemble.batch import BatchAssembler
from pacbioassembly_tpu.codec import dna
from pacbioassembly_tpu.codec.dna import load_patterns
from pacbioassembly_tpu.config import AssemblyConfig

DATA = os.path.join(os.path.dirname(__file__), "data")


def data(name):
    return os.path.join(DATA, name)


def run_batch():
    cfg = AssemblyConfig(
        initial_ref_path=data("synth_init.txt"),
        max_round=30,
        pattern_schedule="roundrobin",
        quirk_init_newline=True,
        quirk_seed_at=True,
        engine="batch",
    )
    reads = ReadStore.from_file(data("synth_reads.bin"), cfg)
    patterns = load_patterns(data("oneseed_spaced.txt"))
    asm = BatchAssembler(cfg, reads, patterns)
    asm.run(out=io.StringIO(), log=None)
    return asm


@pytest.fixture(scope="module")
def batch_asm():
    """One shared full batch-engine assembly (multi-device: the suite's 8
    virtual CPU devices make this the sharded screen + psum elect path)."""
    return run_batch()


def test_batch_engine_assembles_and_is_deterministic(batch_asm):
    asm1 = batch_asm
    assert len(asm1.surviving) == 0, "all reads consumed"

    golden = open(data("golden_consensus_spaced.txt")).read().splitlines()[-1]
    mine = dna.codes_to_text(asm1.ref.text())
    assert abs(len(mine) - len(golden)) < 50

    # the two consensus sequences are near-identical
    res = exact_align(dna.text_to_codes(mine), dna.text_to_codes(golden), ratio=0.3)
    assert res is not None
    assert res.cost <= 0.01 * len(golden), res.cost

    asm2 = run_batch()
    np.testing.assert_array_equal(asm1.ref.text(), asm2.ref.text())


def test_batch_engine_random_schedule_and_random_init():
    """Smoke: batch engine with the reference-default randomized pattern
    schedule and a random initial read, pinned by rng_seed."""
    cfg = AssemblyConfig(
        rng_seed=7,
        max_round=10,
        pattern_schedule="random",
        engine="batch",
    )
    reads = ReadStore.from_file(data("synth_reads.bin"), cfg)
    patterns = [
        dna.parse_pattern(p)
        for p in ["1111111111111111", "111**111*11*1111"]
    ]
    asm1 = BatchAssembler(cfg, reads, patterns)
    asm1.run(out=io.StringIO(), log=None)
    asm2 = BatchAssembler(
        cfg, ReadStore.from_file(data("synth_reads.bin"), cfg), patterns
    )
    asm2.run(out=io.StringIO(), log=None)
    assert asm1.ref.length() > 1000
    np.testing.assert_array_equal(asm1.ref.text(), asm2.ref.text())


def test_multidevice_assembly_equals_single_device(monkeypatch, batch_asm):
    """The production multi-device round (shard_map screening + psum vote
    merge on the 8-virtual-device dp mesh) must produce the IDENTICAL
    consensus to the same engine pinned to one device — the end-to-end form
    of the psum==serial elect equivalence (SURVEY.md §2.4, ref_seq.h:352-362).
    """
    import jax

    asm_multi = batch_asm  # conftest provides 8 virtual CPU devices
    assert len(jax.devices()) == 8, "suite must run on the 8-device mesh"

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])
    asm_single = run_batch()

    np.testing.assert_array_equal(asm_multi.ref.text(), asm_single.ref.text())
    assert asm_multi.surviving == asm_single.surviving
    # both paths actually exercised device voting
    assert [s.nmatches for s in asm_multi.history] == [
        s.nmatches for s in asm_single.history
    ]


def test_trial_seed_cache_vectorized_matches_scalar():
    """_gather_trial_seeds must equal the scalar dna.seed_at /
    ReadStore.quirk_seed per cell, for both quirk settings."""
    from pacbioassembly_tpu.assemble.batch import SEED_LEN, TrialSeedCache

    for quirk in (False, True):
        cfg = AssemblyConfig(quirk_seed_at=quirk, max_trial=16)
        reads = ReadStore.from_file(data("synth_reads.bin"), cfg)
        cache = TrialSeedCache(reads, cfg)
        T = cfg.max_trial
        for i in range(min(5, len(reads))):
            codes = reads.codes(i)
            slen = len(codes)
            for j in range(T):
                for col, pos in ((2 * j, j), (2 * j + 1, slen - SEED_LEN - j)):
                    if j >= min(T, slen - SEED_LEN + 1):
                        assert not cache.valid[i, col]
                        continue
                    want = (
                        reads.quirk_seed(i, pos)
                        if quirk
                        else dna.seed_at(reads.record(i), pos)
                    )
                    assert cache.seeds[i, col] == want, (quirk, i, j, col, pos)
                    assert cache.valid[i, col] == (slen - j >= cfg.overlap_min)


def test_dropped_candidates_stat_on_repetitive_reference(tmp_path):
    """A repetitive reference overflows bucket_max_candidates; the drop must
    be surfaced in RoundStats (the reference tries every candidate in a
    bucket, spaced_seed.cpp:282-296)."""
    from pacbioassembly_tpu.codec import binary_io

    rng = np.random.default_rng(5)
    unit = rng.integers(0, 4, 40)
    genome = np.tile(unit, 80).astype(np.uint8)  # 3200 bp, period 40
    texts = []
    for s in range(0, len(genome) - 600, 120):
        texts.append(dna.codes_to_text(genome[s : s + 600]))
    binfile = tmp_path / "rep.bin"
    binary_io.texts_to_binary_file(iter(texts), str(binfile))
    init = tmp_path / "init.txt"
    init.write_text(dna.codes_to_text(genome[:800]) + "\n5\n")

    cfg = AssemblyConfig(
        initial_ref_path=str(init),
        max_round=1,
        pattern_schedule="roundrobin",
        engine="batch",
        bucket_max_candidates=2,
    )
    reads = ReadStore.from_file(str(binfile), cfg)
    patterns = [dna.parse_pattern("1111111111111111")]
    asm = BatchAssembler(cfg, reads, patterns)
    stats = asm.run_round()
    assert stats.dropped_candidates > 0


def test_batch_convergence_on_noisy_data(tmp_path):
    """Quantified convergence on 9%-error data (VERDICT r1 weak item 7):
    the batch engine's round-start-reference discovery defers some reads to
    later rounds (documented divergence from the exact engine); this pins
    that deferral stays bounded — the engine must still consume ~all reads,
    rebuild ~the whole genome, and drive the residual error well below the
    input error (doc/final.tex:263-277 quality bar). (At 12-15% raw error
    the algorithm plateaus by design: the reference itself assembled only
    120,914 bp of the 4.6 Mb genome from raw error reads.)"""
    from pacbioassembly_tpu.codec import binary_io
    from pacbioassembly_tpu.tools.simulate import SimConfig, simulate

    sim = SimConfig(
        genome_len=24_000, coverage=12.0, mean_read_len=800,
        min_read_len=600, max_read_len=1000,
        sub_rate=0.03, ins_rate=0.03, del_rate=0.03, seed=9,
    )
    genome, read_list, _ = simulate(sim)
    binfile = tmp_path / "noisy.bin"
    with open(binfile, "wb") as fh:
        binary_io.write_records(fh, read_list)

    cfg = AssemblyConfig(
        engine="batch", rng_seed=3, pattern_schedule="random", max_round=50
    )
    reads = ReadStore.from_file(str(binfile), cfg)
    patterns = load_patterns(data("seeds.txt"))
    asm = BatchAssembler(cfg, reads, patterns)
    asm.run(out=io.StringIO(), log=None)

    n = len(reads)
    leftover = len(asm.surviving)
    assert leftover <= 0.05 * n, f"deferred too many reads: {leftover}/{n}"
    assert abs(asm.ref.length() - len(genome)) < 0.1 * len(genome)

    # residual error via 16-mer identity (an anchored whole-contig
    # alignment would need the contig's genome offset; the k-mer share is
    # offset-free): share ~ (1 - e)^16, so share > 0.6 bounds e < ~3.2%,
    # far below the 9% input error (raw-read share would be ~0.22)
    genome_kmers = set(dna.sliding_seeds(genome).tolist())
    contig_kmers = dna.sliding_seeds(asm.ref.text())
    share = np.mean([k in genome_kmers for k in contig_kmers.tolist()])
    assert share > 0.6, f"16-mer identity share {share:.3f}"
    # deferral profile: every consumed read was matched exactly once
    assert sum(s.nmatches for s in asm.history) == n - leftover


def test_multi_contig_assembly(tmp_path):
    """Multi-contig mode: after the first contig terminates, restart on the
    surviving reads (automates the reference's manual -f restart workflow,
    README.mkd:52-63). Two disjoint genome segments force two contigs."""
    from pacbioassembly_tpu.assemble.batch import assemble_contigs
    from pacbioassembly_tpu.codec import binary_io
    from pacbioassembly_tpu.tools.simulate import SimConfig, simulate

    rng = np.random.default_rng(3)
    segs = [rng.integers(0, 4, 8000).astype(np.uint8) for _ in range(2)]
    read_list = []
    for g in segs:
        _, rl, _ = simulate(
            SimConfig(
                genome_len=len(g), coverage=10.0, mean_read_len=700,
                min_read_len=600, max_read_len=900,
                sub_rate=0.01, ins_rate=0.01, del_rate=0.01, seed=5,
            ),
            genome=g,
        )
        read_list += rl
    binfile = tmp_path / "two.bin"
    with open(binfile, "wb") as fh:
        binary_io.write_records(fh, read_list)

    cfg = AssemblyConfig(
        engine="batch", rng_seed=1, pattern_schedule="roundrobin", max_round=40
    )
    reads = ReadStore.from_file(str(binfile), cfg)
    patterns = load_patterns(data("seeds.txt"))
    # dedupe=False: this test pins restart mechanics + exact read
    # accounting (sum of per-contig nreads == consumed), which containment
    # dedup intentionally relaxes (a dropped contig's reads stay
    # consumed); dedup itself is covered by tests/test_postprocess.py
    contigs, surviving = assemble_contigs(cfg, reads, patterns, 4, dedupe=False)

    assert len(contigs) >= 2
    big = [c for c in contigs if len(c.codes) > 6000]
    assert len(big) >= 2, [len(c.codes) for c in contigs]
    # the two large contigs must come from DIFFERENT genome segments
    km = [set(dna.sliding_seeds(g).tolist()) for g in segs]
    owners = []
    for c in big[:2]:
        ck = dna.sliding_seeds(c.codes)
        shares = [np.mean([k in km_i for k in ck.tolist()]) for km_i in km]
        owners.append(int(np.argmax(shares)))
        assert max(shares) > 0.6
    assert set(owners) == {0, 1}
    # restarts consume strictly more reads than a single run
    total = sum(c.nreads for c in contigs)
    assert total > contigs[0].nreads
    assert total == len(reads) - len(surviving)


def test_readstore_mmap_equivalent():
    cfg = AssemblyConfig()
    r1 = ReadStore.from_file(data("synth_reads.bin"), cfg, mmap=False)
    r2 = ReadStore.from_file(data("synth_reads.bin"), cfg, mmap=True)
    assert len(r1) == len(r2)
    np.testing.assert_array_equal(r1.codes(3), r2.codes(3))
    assert r1.quirk_seed(0, 4) == r2.quirk_seed(0, 4)


def test_device_materialize_equivalent(monkeypatch):
    """assemble/gather.py must build byte-identical (a, la, b, lb) batches
    to the host _materialize path (up to its ladder padding), and the
    engine must produce the same consensus either way."""
    import jax

    from pacbioassembly_tpu.align.screen import size_bucket
    from pacbioassembly_tpu.assemble.batch import expand_candidates
    from pacbioassembly_tpu.index import build_seedmap

    # the suite runs on 8 virtual CPU devices; pin the single-device path
    # (multi-device screening shards host-packed batches instead)
    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])

    cfg = AssemblyConfig(
        initial_ref_path=data("synth_init.txt"),
        pattern_schedule="roundrobin",
        quirk_init_newline=True,
        quirk_seed_at=True,
        engine="batch",
    )
    reads = ReadStore.from_file(data("synth_reads.bin"), cfg)
    patterns = load_patterns(data("oneseed_spaced.txt"))
    asm = BatchAssembler(cfg, reads, patterns)

    pattern = patterns[0]
    index, _ = build_seedmap(asm.ref.text(), pattern)
    cands, _ = expand_candidates(
        asm.reads, asm.surviving, index, pattern, cfg, asm._trial_cache
    )
    assert cands, "fixture must produce candidates"
    seg_len, ref_len = asm._geometry(cands)
    LB, LA, W = size_bucket(int(seg_len.max()), cfg.ratio)
    idxs = sorted(range(len(cands)), key=lambda n: -seg_len[n])

    a_h, la_h, b_h, lb_h = asm._materialize(cands, idxs, seg_len, ref_len, LB, LA)
    dev = asm._device_batch(cands, idxs, ref_len, LB, LA)
    assert dev is not None
    a_d, la_d, b_d, lb_d = (np.asarray(x) for x in dev)
    B0 = len(idxs)
    np.testing.assert_array_equal(a_d[:B0], a_h)
    np.testing.assert_array_equal(b_d[:B0], b_h)
    np.testing.assert_array_equal(la_d[:B0], la_h)
    np.testing.assert_array_equal(lb_d[:B0], lb_h)
    # ladder pad rows must be cheap rejects
    assert (la_d[B0:] == 1).all() and (lb_d[B0:] == 1).all()


def test_retreat_edges_unit():
    """ConsensusRef.retreat_edges trims exactly the weak (total < min_total)
    runs at both ends, refuses to trim below keep_min, and no-ops on locked
    or all-weak references."""
    from pacbioassembly_tpu.consensus import ConsensusRef

    codes = np.arange(100, dtype=np.uint8) % 4
    ref = ConsensusRef(codes, capacity=3000)
    # fresh reference: total == 1 everywhere -> all-weak, must no-op
    assert ref.retreat_edges(min_total=2) == 0
    assert ref.length() == 100

    # strong interior [10, 90): 10 weak cells on each side
    ref.total[ref.beg + 10 : ref.beg + 90] = 3
    v0 = ref.version
    assert ref.retreat_edges(min_total=2) == 20
    assert ref.length() == 80
    assert ref.beg == ref.pre and ref.end == ref.post
    assert ref.version == v0 + 1
    np.testing.assert_array_equal(ref.text(), codes[10:90])
    # nothing weak left at the edges -> no-op
    assert ref.retreat_edges(min_total=2) == 0

    # keep_min guard: strong interior shorter than keep_min -> no-op
    ref2 = ConsensusRef(codes, capacity=3000)
    ref2.total[ref2.beg + 40 : ref2.beg + 60] = 3
    assert ref2.retreat_edges(min_total=2, keep_min=64) == 0
    assert ref2.length() == 100

    # locked -> no-op
    ref3 = ConsensusRef(codes, locked=True, capacity=3000)
    ref3.total[ref3.beg + 10 : ref3.beg + 90] = 3
    assert ref3.retreat_edges(min_total=2) == 0


def test_edge_retreat_recovers_from_stall(tmp_path):
    """Stall recovery: at raw-PacBio error rates the engine plateaus when
    the single-read edge fringe blocks all further alignments (the
    reference just terminates there, spaced_seed.cpp:441-447). With an
    edge_retreat budget the engine trims that fringe and keeps growing —
    the run must retreat at least once and end with a contig at least as
    long as the no-retreat baseline's best."""
    from pacbioassembly_tpu.codec import binary_io
    from pacbioassembly_tpu.tools.simulate import SimConfig, simulate

    sim = SimConfig(
        genome_len=30_000, coverage=14.0, mean_read_len=800,
        min_read_len=600, max_read_len=1000,
        sub_rate=0.05, ins_rate=0.05, del_rate=0.05, seed=21,
    )
    genome, read_list, _ = simulate(sim)
    binfile = tmp_path / "raw_error.bin"
    with open(binfile, "wb") as fh:
        binary_io.write_records(fh, read_list)
    patterns = load_patterns(data("seeds.txt"))

    def run(edge_retreat):
        cfg = AssemblyConfig(
            engine="batch", rng_seed=5, pattern_schedule="random",
            max_round=120, edge_retreat=edge_retreat,
        )
        reads = ReadStore.from_file(str(binfile), cfg)
        asm = BatchAssembler(cfg, reads, patterns)
        asm.run(out=io.StringIO(), log=None)
        return asm

    base = run(0)
    best_base = max(s.ref_len for s in base.history)
    assert base.retreats == 0
    # baseline must actually stall well short of the genome (otherwise
    # this test isn't exercising recovery; tighten sim params if it does)
    assert base.nround < 120 and best_base < 0.9 * sim.genome_len

    rec = run(8)
    assert rec.retreats >= 1
    best_rec = max(s.ref_len for s in rec.history)
    # identical rng schedule until the baseline's termination point, so
    # recovery can only add rounds and never lose the baseline's best
    assert rec.nround > base.nround
    assert best_rec >= best_base


def test_retreat_fixed_bite():
    """retreat_fixed: the fixed-span stall escalation (r3 — the first CLR
    run terminated with its whole retreat budget unused because the stalled
    edge had multi-read support; ConsensusRef.retreat_fixed docstring)."""
    from pacbioassembly_tpu.consensus import ConsensusRef

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 1000).astype(np.uint8)
    ref = ConsensusRef(codes, capacity=9000)
    ref.total[ref.beg : ref.end] = 5  # well-supported everywhere
    assert ref.retreat_edges(min_total=2) == 0  # nothing weak to trim
    assert ref.retreat_fixed(100, keep_min=64) == 200
    assert ref.length() == 800
    # keep_min guard: cannot cut below the minimum useful consensus
    assert ref.retreat_fixed(600, keep_min=700) == 100  # 2 * (800-700)//2
    assert ref.length() == 700
    assert ref.retreat_fixed(600, keep_min=700) == 0
    # locked reference never retreats
    ref.locked = True
    assert ref.retreat_fixed(10) == 0


def test_prefilter_truncated_scoring_and_no_lost_accepts(monkeypatch, tmp_path):
    """Screening prefilter (AssemblyConfig.prefilter_len): (a) the device
    truncated-window scoring (gather.py lb-clamp) matches the host scorer
    on the same truncated geometry; (b) on a candidate flood from a
    low-weight pattern, prefilter+full-screen accepts EXACTLY the same
    candidates as the full screen alone while rejecting most of the junk
    early."""
    import jax

    from pacbioassembly_tpu.align.scan import batch_score
    from pacbioassembly_tpu.codec import binary_io
    from pacbioassembly_tpu.index import build_seedmap
    from pacbioassembly_tpu.assemble.batch import expand_candidates
    from pacbioassembly_tpu.tools.simulate import SimConfig, simulate

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])

    sim = SimConfig(
        genome_len=30_000, coverage=10.0, mean_read_len=1000,
        min_read_len=800, max_read_len=1200,
        sub_rate=0.03, ins_rate=0.03, del_rate=0.03, seed=13,
    )
    genome, read_list, _ = simulate(sim)
    binfile = tmp_path / "pf.bin"
    with open(binfile, "wb") as fh:
        binary_io.write_records(fh, read_list)
    cfg = AssemblyConfig(
        engine="batch", rng_seed=2, pattern_schedule="roundrobin", max_round=6
    )
    reads = ReadStore.from_file(str(binfile), cfg)
    patterns = load_patterns(data("seeds.txt"))
    asm = BatchAssembler(cfg, reads, patterns)
    asm.run(out=io.StringIO(), log=None)
    assert asm.ref.length() > 3000

    # weight-8 pattern: ~1 random collision per 65k trials floods the
    # candidate set with junk alongside the real overlaps
    pattern = dna.parse_pattern("1111111100000000")
    index, _ = build_seedmap(asm.ref.text(), pattern)
    cands, _ = expand_candidates(
        asm.reads, asm.surviving, index, pattern, cfg, asm._trial_cache
    )
    assert len(cands) >= 1000, "flood fixture must produce many candidates"
    seg_len, ref_len = asm._geometry(cands)

    # (a) device truncated scoring == host scorer on the same geometry
    LBp = cfg.prefilter_len
    Wp = 1 + int(LBp * cfg.prefilter_ratio)  # band must cover the ratio's goal cells
    LAp = LBp + Wp + 1
    idxs = np.arange(min(64, len(cands)))
    vecs = asm._device_vectors(cands, idxs, ref_len, LAp, 64)
    packed = asm._builder().score(
        asm.ref, *vecs, LA=LAp, LB=LBp, w_max=Wp,
        ratio=cfg.prefilter_ratio, backend="scan",
    )
    a_h = np.zeros((len(idxs), LAp), np.uint8)
    b_h = np.zeros((len(idxs), LBp), np.uint8)
    la_h = np.zeros(len(idxs), np.int32)
    lb_h = np.zeros(len(idxs), np.int32)
    for bi, n in enumerate(idxs):
        cj = int(cands.j[n])
        fwd = bool(cands.forward[n])
        codes = asm.reads.codes(asm.surviving[int(cands.read[n])])
        seg = (codes[cj:] if fwd else codes[: len(codes) - cj][::-1])[:LBp]
        p = asm.ref.beg + int(cands.r_offset[n])
        need = min(int(ref_len[n]), LAp)
        a = asm.ref.buf[p : p + need] if fwd else asm.ref.buf[p - need + 1 : p + 1][::-1]
        a_h[bi, : len(a)] = a
        b_h[bi, : len(seg)] = seg
        la_h[bi] = need
        lb_h[bi] = len(seg)
    res_h = batch_score(
        a_h, la_h, b_h, lb_h, la_max=LAp, w_max=Wp, ratio=cfg.prefilter_ratio
    )
    np.testing.assert_array_equal(
        packed[: len(idxs), 0] != 0, np.asarray(res_h.accept)
    )

    # (b) identical final accepts with and without the prefilter
    asm.cfg.prefilter_len = 0
    acc_off = asm.screen(cands).copy()
    asm.cfg.prefilter_len = LBp
    asm.cfg.prefilter_min_batch = 1
    acc_on = asm.screen(cands).copy()
    np.testing.assert_array_equal(acc_on, acc_off)
    assert acc_off.sum() >= 1, "fixture must contain real overlaps"
    assert 0 <= asm.prefilter_kept <= 0.5 * len(cands), (
        f"prefilter kept {asm.prefilter_kept}/{len(cands)} — not selective"
    )


def test_prefilter_no_lost_accepts_high_error(monkeypatch, tmp_path):
    """The prefilter targets 15% raw-error runs, but the r2 equivalence
    fixture only covered 3% error (ADVICE r2): assert accept-set equality
    with/without the prefilter on a 15%-total, CLR-profile
    (insertion-dominated 1:12:4) fixture — the exact regime of the
    reference's published contig (doc/final.tex:263-277)."""
    import jax

    from pacbioassembly_tpu.codec import binary_io
    from pacbioassembly_tpu.index import build_seedmap
    from pacbioassembly_tpu.assemble.batch import expand_candidates
    from pacbioassembly_tpu.tools.simulate import SimConfig, simulate, split_error_rate

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])

    sub, ins, dele = split_error_rate(0.15, "clr")
    sim = SimConfig(
        genome_len=25_000, coverage=14.0, mean_read_len=1000,
        min_read_len=800, max_read_len=1200,
        sub_rate=sub, ins_rate=ins, del_rate=dele, seed=17,
    )
    genome, read_list, _ = simulate(sim)
    binfile = tmp_path / "pf15.bin"
    with open(binfile, "wb") as fh:
        binary_io.write_records(fh, read_list)
    cfg = AssemblyConfig(
        engine="batch", rng_seed=3, pattern_schedule="roundrobin", max_round=8
    )
    reads = ReadStore.from_file(str(binfile), cfg)
    patterns = load_patterns(data("seeds.txt"))
    asm = BatchAssembler(cfg, reads, patterns)
    asm.run(out=io.StringIO(), log=None)
    assert asm.ref.length() > 1500

    # candidate set across every pattern so worst-case (15%-read vs
    # 15%-edge) geometries are represented
    n_total = n_acc = 0
    for pattern in patterns:
        index, _ = build_seedmap(asm.ref.text(), pattern)
        cands, _ = expand_candidates(
            asm.reads, asm.surviving, index, pattern, cfg, asm._trial_cache
        )
        if len(cands) == 0:
            continue
        asm.cfg.prefilter_len = 0
        acc_off = asm.screen(cands).copy()
        asm.cfg.prefilter_len = 128
        asm.cfg.prefilter_min_batch = 1
        acc_on = asm.screen(cands).copy()
        np.testing.assert_array_equal(acc_on, acc_off)
        n_total += len(cands)
        n_acc += int(acc_off.sum())
    assert n_total >= 200, f"fixture too small ({n_total} candidates)"
    assert n_acc >= 3, "fixture must contain real 15%-error overlaps"


def test_fruitless_retreat_escape():
    """edge_retreat_fruitless: once every surviving read is unalignable,
    N consecutive zero-match retreats must end the run instead of
    nibbling the contig for the whole edge_retreat budget (the r4
    whole-genome run ended with 5 junk reads and 186 unspent retreats
    that could only trim edges)."""
    from pacbioassembly_tpu.codec import binary_io
    from pacbioassembly_tpu.tools.simulate import SimConfig, simulate

    rng = np.random.default_rng(0)
    _, reads_list, _ = simulate(SimConfig(
        genome_len=3000, coverage=3.0, mean_read_len=900,
        min_read_len=600, max_read_len=1200,
        sub_rate=0.01, ins_rate=0.01, del_rate=0.01, seed=1,
    ))
    junk = [rng.integers(0, 4, 800).astype(np.uint8) for _ in range(3)]
    buf = io.BytesIO()
    binary_io.write_records(buf, reads_list + junk)
    cfg = AssemblyConfig(
        engine="batch", rng_seed=0, pattern_schedule="roundrobin",
        edge_retreat=50, edge_retreat_bite=8, edge_retreat_fruitless=2,
    )
    reads = ReadStore(np.frombuffer(buf.getvalue(), np.uint8))
    patterns = [dna.parse_pattern("1111111111111111")]
    asm = BatchAssembler(cfg, reads, patterns)
    asm.run(out=None, log=None)
    # junk reads survive; the escape must fire long before the budget
    assert len(asm.surviving) >= 3
    assert 1 <= asm.retreats <= 5, asm.retreats


def test_timed_launch_retries(monkeypatch):
    """_timed_launch retries transient JaxRuntimeError-shaped failures
    (the tunnel's remote-compile endpoint dropping mid-call) and re-raises
    deterministic errors immediately."""
    import time as T

    from pacbioassembly_tpu.assemble import batch as B

    monkeypatch.setattr(T, "sleep", lambda s: None)

    class JaxRuntimeError(Exception):
        pass

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise JaxRuntimeError("transient transport failure")
        return "ok"

    log = []
    assert B._timed_launch(log, "fs", (1, 2), flaky) == "ok"
    assert len(calls) == 3
    assert log and log[0]["kind"] == "fs"

    def bad():
        raise ValueError("deterministic")

    with pytest.raises(ValueError):
        B._timed_launch(log, "fs", (1, 3), bad)

    def always_down():
        raise JaxRuntimeError("still down")

    with pytest.raises(JaxRuntimeError):
        B._timed_launch(log, "fs", (1, 4), always_down)


def test_parallel_commit_equivalence():
    """_commit_host with the two-threaded boundary split must consume the
    same reads and produce the identical consensus state as the
    sequential path (cfg.parallel_commit=False), including growth at
    both ends."""
    import dataclasses

    from pacbioassembly_tpu.assemble.batch import CandidateBatch
    from pacbioassembly_tpu.codec import binary_io

    rng = np.random.default_rng(5)
    L = 120_000
    genome = rng.integers(0, 4, L + 600).astype(np.uint8)  # 300bp tails
    ref_codes = genome[300 : 300 + L]

    # reads: interior-boundary copies (some mutated) + one grower per side
    read_list = []
    cand_rows = []  # (read_idx, j, forward, r_offset)
    for k in range(6):  # right-region forward reads
        start = L - 2000 - 137 * k
        seg = ref_codes[start : start + 1800].copy()
        if k % 2:
            pos = rng.choice(1800, 18, replace=False)
            seg[pos] = (seg[pos] + 1) % 4
        read_list.append(seg)
        cand_rows.append((len(read_list) - 1, 0, True, start))
    # right grower: consumes to the end, appends 300 new bases
    grow_r = genome[300 + L - 1500 : 300 + L + 300].copy()
    read_list.append(grow_r)
    cand_rows.append((len(read_list) - 1, 0, True, L - 1500))
    for k in range(6):  # left-region backward reads
        end = 2000 + 141 * k
        seg = ref_codes[end - 1800 : end].copy()
        if k % 2 == 0:
            pos = rng.choice(1800, 18, replace=False)
            seg[pos] = (seg[pos] + 1) % 4
        read_list.append(seg)
        cand_rows.append((len(read_list) - 1, 0, False, end - 1))
    # left grower: consumes to the head, prepends 300 new bases
    grow_l = genome[0 : 300 + 1500].copy()
    read_list.append(grow_l)
    cand_rows.append((len(read_list) - 1, 0, False, 1499))

    buf = io.BytesIO()
    binary_io.write_records(buf, read_list)

    def build(parallel):
        cfg = AssemblyConfig(
            engine="batch", rng_seed=0, parallel_commit=parallel,
            max_seq_len=400_000,
        )
        reads = ReadStore(np.frombuffer(buf.getvalue(), np.uint8))
        patterns = [dna.parse_pattern("1111111111111111")]
        asm = BatchAssembler(cfg, reads, patterns)
        from pacbioassembly_tpu.consensus import ConsensusRef

        asm.ref = ConsensusRef(ref_codes, capacity=3 * 400_000)
        work = [(i, [i]) for i in range(len(cand_rows))]
        cands = CandidateBatch(
            read=[r for r, _, _, _ in cand_rows],
            j=[j for _, j, _, _ in cand_rows],
            forward=[f for _, _, f, _ in cand_rows],
            r_offset=[p for _, _, _, p in cand_rows],
            rank=[0] * len(cand_rows),
        )
        nal, consumed = asm._commit_host(cands, work)
        return asm, nal, consumed

    asm_s, nal_s, cons_s = build(parallel=False)
    asm_p, nal_p, cons_p = build(parallel=True)
    assert nal_s == nal_p == len(cand_rows)
    assert cons_s == cons_p
    assert len(cons_s) == len(cand_rows)  # every candidate aligns
    r_s, r_p = asm_s.ref, asm_p.ref
    # growth extends [pre, post); beg/end collapse at the next evolve
    assert (r_s.post - r_s.pre) == (r_p.post - r_p.pre) == L + 600
    np.testing.assert_array_equal(r_s.buf[r_s.pre : r_s.post], r_p.buf[r_p.pre : r_p.post])
    np.testing.assert_array_equal(
        r_s.sel[r_s.pre : r_s.post], r_p.sel[r_p.pre : r_p.post]
    )
    np.testing.assert_array_equal(
        r_s.total[r_s.pre : r_s.post], r_p.total[r_p.pre : r_p.post]
    )
    # determinism of the threaded path itself
    asm_p2, _, cons_p2 = build(parallel=True)
    assert cons_p2 == cons_p
    np.testing.assert_array_equal(
        asm_p.ref.buf[asm_p.ref.pre : asm_p.ref.post],
        asm_p2.ref.buf[asm_p2.ref.pre : asm_p2.ref.post],
    )
