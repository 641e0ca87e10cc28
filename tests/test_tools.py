"""Tools layer: simulator, FASTA/FASTQ import, checkpoint CLI round-trip."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from pacbioassembly_tpu.codec import binary_io, dna
from pacbioassembly_tpu.tools.fastx import parse_fastx
from pacbioassembly_tpu.tools.simulate import SimConfig, mutate_read, simulate

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_mutate_read_rates():
    rng = np.random.default_rng(0)
    cfg = SimConfig(sub_rate=0.0, ins_rate=0.0, del_rate=0.0)
    read = rng.integers(0, 4, 1000).astype(np.uint8)
    np.testing.assert_array_equal(mutate_read(read.copy(), cfg, rng), read)

    cfg = SimConfig(sub_rate=0.0, ins_rate=0.0, del_rate=0.5)
    out = mutate_read(read.copy(), cfg, np.random.default_rng(1))
    assert 400 < len(read) - len(out) < 600

    cfg = SimConfig(sub_rate=0.0, ins_rate=0.5, del_rate=0.0)
    out = mutate_read(read.copy(), cfg, np.random.default_rng(2))
    assert 400 < len(out) - len(read) < 600


def test_simulated_reads_align_to_genome():
    cfg = SimConfig(genome_len=5000, coverage=5, mean_read_len=900,
                    sub_rate=0.05, ins_rate=0.05, del_rate=0.05, seed=3)
    genome, reads, starts = simulate(cfg)
    from pacbioassembly_tpu.align import exact_align

    ok = 0
    for read, s in list(zip(reads, starts))[:5]:
        res = exact_align(genome[s:], read, ratio=0.3)
        if res is not None and res.matlen_b > 0.8 * len(read):
            ok += 1
    assert ok >= 4


def test_parse_fasta_and_fastq(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">r1\nACGT\nACGT\n>r2\nTTTT\n")
    recs = list(parse_fastx(open(fa)))
    assert recs == [("r1", "ACGTACGT", None), ("r2", "TTTT", None)]

    fq = tmp_path / "x.fq"
    fq.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\n!!!!\n")
    recs = list(parse_fastx(open(fq)))
    assert recs == [("r1", "ACGT", "IIII"), ("r2", "GGCC", "!!!!")]


def test_import_cli(tmp_path, monkeypatch):
    from pacbioassembly_tpu.tools import cli

    fa = tmp_path / "x.fa"
    fa.write_text(">r1\n" + "ACGT" * 50 + "\n>r2\nAC\n")
    out = tmp_path / "x.bin"
    qout = tmp_path / "q.txt"
    cli.main(["import", str(fa), str(out), "--min-len", "10",
              "--quality-out", str(qout)])
    texts = list(binary_io.binary_file_to_texts(str(out)))
    assert texts == ["ACGT" * 50]
    assert qout.read_text() == "0\n"


def test_checkpoint_cli_roundtrip(tmp_path):
    """Run 1 round with checkpointing, resume, and match the uninterrupted
    final consensus."""
    from pacbioassembly_tpu.assemble import Assembler, ReadStore
    from pacbioassembly_tpu.codec.dna import load_patterns
    from pacbioassembly_tpu.config import AssemblyConfig

    ck = str(tmp_path / "ck.npz")
    base = dict(
        initial_ref_path=os.path.join(DATA, "synth_init.txt"),
        pattern_schedule="roundrobin",
        quirk_init_newline=True,
        quirk_seed_at=True,
    )
    patterns = load_patterns(os.path.join(DATA, "oneseed_spaced.txt"))

    cfg1 = AssemblyConfig(max_round=1, checkpoint_path=ck, **base)
    asm1 = Assembler(cfg1, ReadStore.from_file(os.path.join(DATA, "synth_reads.bin"), cfg1), patterns)
    asm1.run(out=io.StringIO(), log=None)
    assert os.path.exists(ck)

    cfg2 = AssemblyConfig(max_round=30, resume_path=ck, **base)
    asm2 = Assembler(cfg2, ReadStore.from_file(os.path.join(DATA, "synth_reads.bin"), cfg2), patterns)
    asm2.run(out=io.StringIO(), log=None)

    golden = open(os.path.join(DATA, "golden_consensus_spaced.txt")).read().splitlines()[-1]
    assert dna.codes_to_text(asm2.ref.text()) == golden


def test_metrics_jsonl(tmp_path):
    import json

    from pacbioassembly_tpu.assemble import Assembler, ReadStore
    from pacbioassembly_tpu.codec.dna import load_patterns
    from pacbioassembly_tpu.config import AssemblyConfig

    mpath = str(tmp_path / "metrics.jsonl")
    cfg = AssemblyConfig(
        initial_ref_path=os.path.join(DATA, "synth_init.txt"),
        max_round=2,
        pattern_schedule="roundrobin",
        quirk_init_newline=True,
        quirk_seed_at=True,
        metrics_path=mpath,
    )
    asm = Assembler(cfg, ReadStore.from_file(os.path.join(DATA, "synth_reads.bin"), cfg), load_patterns(os.path.join(DATA, "oneseed_spaced.txt")))
    asm.run(out=io.StringIO(), log=None)
    recs = [json.loads(l) for l in open(mpath)]
    assert len(recs) == 3
    assert recs[0]["event"] == "run_start"
    assert recs[0]["resume"] is False
    assert recs[1]["event"] == "round"
    assert recs[1]["nmatches"] == 45
    assert "dp_cells_per_s" in recs[1]


def test_multi_contig_cli(tmp_path, capsys):
    """--contigs N prints FASTA with per-contig stats."""
    from pacbioassembly_tpu.tools import cli

    cli.main([
        "assemble", os.path.join(DATA, "synth_reads.bin"),
        os.path.join(DATA, "oneseed_spaced.txt"),
        "-f", os.path.join(DATA, "synth_init.txt"),
        "--engine", "batch", "--schedule", "roundrobin",
        "--quirk-seed-at", "--quirk-init-newline",
        "-m", "30", "--contigs", "2", "-q",
    ])
    out = capsys.readouterr().out
    headers = [ln for ln in out.splitlines() if ln.startswith(">contig_")]
    assert headers and headers[0].startswith(">contig_0 length=")
    seq = out.splitlines()[1]
    assert len(seq) > 1000 and set(seq) <= set("ACGT")
