"""Pallas parent-emission kernel parity (interpret mode on CPU).

tbwave.batch_parents_pallas + walk_parents must reproduce EXACTLY the edit
streams of align/traceback.batch_align_traceback (which is itself pinned to
the numpy exactness root align/banded.py), given the screening pass's
goal cells — the same division of labor the batch engine uses on TPU.
"""

import numpy as np

from pacbioassembly_tpu.align.scan import batch_score
from pacbioassembly_tpu.align.tbwave import batch_parents_pallas, walk_parents
from pacbioassembly_tpu.align.traceback import batch_align_traceback

from test_scan import make_cases, pack


def _run_both(cases, LA, LB, W, ratio=0.3, rows_max=None):
    A, las, Bm, lbs = pack(cases, LA, LB)
    ref = batch_align_traceback(
        A, las, Bm, lbs, la_max=LA, w_max=W, ratio=ratio, rows_max=rows_max
    )
    scores = batch_score(A, las, Bm, lbs, la_max=LA, w_max=W, ratio=ratio)
    parents, md, lb_dp = batch_parents_pallas(
        A, las, Bm, lbs, la_max=LA, w_max=W, ratio=ratio,
        rows_max=rows_max, interpret=True,
    )
    E = parents.shape[1] * 16 + W + 2 + 32
    ops, vals, nedit = walk_parents(
        parents, Bm, lb_dp, md,
        scores.matlen_a, scores.matlen_b, scores.accept,
        w_max=W, e_max=E,
    )
    return ref, np.asarray(ops), np.asarray(vals), np.asarray(nedit)


def test_tbwave_edits_match_traceback():
    rng = np.random.default_rng(33)
    cases = make_cases(rng, 24, max_len=60)
    LA, LB, W = 128, 80, 28
    ref, ops, vals, nedit = _run_both(cases, LA, LB, W)
    acc = np.asarray(ref.scores.accept)
    n_acc = 0
    for i in range(len(cases)):
        if not acc[i]:
            continue
        n_acc += 1
        ne = int(np.asarray(ref.nedit)[i])
        assert nedit[i] == ne, i
        np.testing.assert_array_equal(ops[i, :ne], np.asarray(ref.ops)[i, :ne])
        np.testing.assert_array_equal(vals[i, :ne], np.asarray(ref.vals)[i, :ne])
    assert n_acc >= 5, "fixture must include accepted alignments"


def test_tbwave_batch_engine_integration(monkeypatch, tmp_path):
    """The batch engine's Pallas-traceback commit path (screen goal cells ->
    tbwave parents -> device walk -> _apply_interior_votes) must produce
    the IDENTICAL consensus to the default XLA-traceback path. On real TPU
    this is the production route; here it runs in interpret mode via the
    engine's test hook."""
    import io
    import jax

    from pacbioassembly_tpu.assemble import ReadStore
    from pacbioassembly_tpu.assemble.batch import BatchAssembler
    from pacbioassembly_tpu.codec import binary_io, dna
    from pacbioassembly_tpu.config import AssemblyConfig
    from pacbioassembly_tpu.tools.simulate import SimConfig, simulate

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])

    sim = SimConfig(
        genome_len=12_000, coverage=12.0, mean_read_len=900,
        min_read_len=600, max_read_len=1500,
        sub_rate=0.03, ins_rate=0.03, del_rate=0.03, seed=8,
    )
    _, read_list, _ = simulate(sim)
    binfile = tmp_path / "tb.bin"
    with open(binfile, "wb") as fh:
        binary_io.write_records(fh, read_list)
    cfg = AssemblyConfig(
        engine="batch", rng_seed=4, pattern_schedule="roundrobin", max_round=6
    )
    patterns = [dna.parse_pattern("1111111111111111")]

    def run(force_tbwave):
        reads = ReadStore.from_file(str(binfile), cfg)
        asm = BatchAssembler(cfg, reads, patterns)
        if force_tbwave:
            asm._tb_pallas_interpret = True
        asm.run(out=io.StringIO(), log=None)
        return asm

    a1 = run(False)
    a2 = run(True)
    assert a1.ref.length() > 2000
    np.testing.assert_array_equal(a1.ref.text(), a2.ref.text())
    np.testing.assert_array_equal(
        a1.ref.sel[a1.ref.beg : a1.ref.end], a2.ref.sel[a2.ref.beg : a2.ref.end]
    )
    assert a1.surviving == a2.surviving


def test_tbwave_multi_rowblock_and_refresh():
    """Cases long enough to cross several 16-row blocks AND a 128-row
    window refresh, with mixed lengths in one batch."""
    rng = np.random.default_rng(34)
    cases = []
    for ln in (40, 150, 260, 300, 299, 256):
        a = rng.integers(0, 4, ln).astype(np.uint8)
        b = a.copy()
        nmut = max(1, ln // 15)
        pos = rng.choice(ln, nmut, replace=False)
        b[pos] = (b[pos] + rng.integers(1, 4, nmut)) % 4
        # some indels
        b = np.delete(b, rng.choice(len(b), 2, replace=False))
        ins_at = rng.integers(0, len(b))
        b = np.insert(b, ins_at, rng.integers(0, 4))
        cases.append((a, b))
    LA, LB, W = 384, 384, 96
    ref, ops, vals, nedit = _run_both(cases, LA, LB, W)
    acc = np.asarray(ref.scores.accept)
    assert acc.sum() >= 4
    for i in range(len(cases)):
        if not acc[i]:
            continue
        ne = int(np.asarray(ref.nedit)[i])
        assert nedit[i] == ne, i
        np.testing.assert_array_equal(ops[i, :ne], np.asarray(ref.ops)[i, :ne])
        np.testing.assert_array_equal(vals[i, :ne], np.asarray(ref.vals)[i, :ne])
