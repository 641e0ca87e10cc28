"""End-to-end pipeline parity tests against golden outputs of the compiled
reference binaries.

Goldens were produced by compiling the unmodified reference out-of-tree and
running it on the committed synthetic dataset (provenance:
tests/data/make_golden.py). Deterministic configs only: pinned -f initial
reference + single seed pattern (the reference is otherwise randomized by
srand(time(0)); spaced_seed.cpp:194,412).

Quirk flags exercised here replicate documented reference bugs required for
bit-parity (see AssemblyConfig.quirk_*):
  * seed_at pos%4==0 fast path reads byte offset pos instead of pos>>2
  * fgets keeps '\\n' as a bogus final base of the -f initial reference
"""

import io
import os

import numpy as np
import pytest

from pacbioassembly_tpu.assemble import Assembler, ReadStore
from pacbioassembly_tpu.codec.dna import load_patterns
from pacbioassembly_tpu.config import AssemblyConfig
from pacbioassembly_tpu.tools import cli

DATA = os.path.join(os.path.dirname(__file__), "data")


def data(name):
    return os.path.join(DATA, name)


def make_cfg(**kw):
    return AssemblyConfig(
        initial_ref_path=data("synth_init.txt"),
        max_round=30,
        pattern_schedule="roundrobin",
        quirk_init_newline=True,
        quirk_seed_at=True,
        **kw,
    )


@pytest.mark.parametrize("name", ["spaced", "full"])
def test_assembly_bit_parity(name):
    """Exact engine reproduces the reference consensus byte-for-byte,
    including mid-round growth in both directions and multi-round evolve."""
    cfg = make_cfg()
    reads = ReadStore.from_file(data("synth_reads.bin"), cfg)
    patterns = load_patterns(data(f"oneseed_{name}.txt"))
    asm = Assembler(cfg, reads, patterns)
    out = io.StringIO()
    asm.run(out=out, log=None)
    golden = open(data(f"golden_consensus_{name}.txt")).read()
    assert out.getvalue() == golden


def test_assembly_consumes_all_reads():
    cfg = make_cfg()
    reads = ReadStore.from_file(data("synth_reads.bin"), cfg)
    patterns = load_patterns(data("oneseed_spaced.txt"))
    asm = Assembler(cfg, reads, patterns)
    asm.run(out=io.StringIO(), log=None)
    assert len(asm.surviving) == 0
    assert asm.history[0].nmatches == 45  # golden_log_spaced.txt
    assert asm.history[1].nmatches == 35
    assert asm.history[-1].nmatches == 0


@pytest.mark.parametrize("mode", ["batched", "host-loop"])
def test_locator_parity(capsys, monkeypatch, mode):
    """Both the default batched-device locator (tools/locate.py) and the
    sequential host loop must match the reference binary's golden TSV."""
    stdin = io.StringIO(open(data("synth_reads.txt")).read())
    monkeypatch.setattr("sys.stdin", stdin)
    argv = ["locate", data("synth_genome.txt"), "1111111111111111"]
    if mode == "host-loop":
        argv.append("--host-loop")
    cli.main(argv)
    out = capsys.readouterr().out
    assert out == open(data("golden_locator.txt")).read()


def test_visualize_parity_on_successful_pairs(capsys, monkeypatch):
    """The reference prints stale-buffer garbage for failed pairs (no
    `continue` after the error branch, visual_align.cpp:51-56); we skip
    failures, so compare only successful pairs plus exact stderr."""
    stdin = io.StringIO(open(data("real_align.txt")).read())
    monkeypatch.setattr("sys.stdin", stdin)
    cli.main(["visualize"])
    captured = capsys.readouterr()
    golden = open(data("golden_visual.txt")).read().splitlines()
    golden_err = open(data("golden_visual_err.txt")).read().splitlines()
    mine = captured.out.splitlines()
    assert captured.err.splitlines() == golden_err

    failed_refs = {golden_err[i] for i in range(1, len(golden_err), 3)}
    pairs = open(data("real_align.txt")).read().split()
    gi = mi = 0
    n_ok = 0
    for p in range(len(pairs) // 2):
        if pairs[2 * p] in failed_refs:
            gi += 3
            continue
        assert mine[mi : mi + 3] == golden[gi : gi + 3], f"pair {p}"
        gi += 3
        mi += 3
        n_ok += 1
    assert n_ok == 3 and len(failed_refs) == 3


def test_quality_parity(capsys, monkeypatch):
    stdin = io.StringIO(open(data("quality_input.txt")).read())
    monkeypatch.setattr("sys.stdin", stdin)
    cli.main(["quality"])
    assert capsys.readouterr().out == open(data("golden_quality.txt")).read()


def test_stat_hash_parity(capsys, monkeypatch):
    stdin = io.StringIO(open(data("quality_input.txt")).read())
    monkeypatch.setattr("sys.stdin", stdin)
    cli.main(["stat-hash"])
    assert capsys.readouterr().out == open(data("golden_stathash.txt")).read()


def test_convert_roundtrip_cli(tmp_path, capsys, monkeypatch):
    txt = open(data("synth_reads.txt")).read()
    binpath = tmp_path / "r.bin"
    monkeypatch.setattr("sys.stdin", io.StringIO(txt))
    cli.main(["convert", "1", str(binpath)])
    # byte-identical to the committed binary produced by our writer
    ref_bytes = open(data("synth_reads.bin"), "rb").read()
    assert binpath.read_bytes() == ref_bytes
    monkeypatch.setattr("sys.stdin", io.StringIO(txt))
    cli.main(["convert", "0"])
    captured = capsys.readouterr()
    cli.main(["convert", "2", str(binpath)])
    captured = capsys.readouterr()
    assert captured.out.split() == txt.split()


def test_checkpoint_resume_mid_assembly():
    """Checkpoint/resume: stop after round 1, snapshot, resume, and land on
    the same final consensus (the reference's manual -f resume workflow made
    real; SURVEY.md §5)."""
    from pacbioassembly_tpu.consensus import ConsensusRef

    cfg = make_cfg()
    reads = ReadStore.from_file(data("synth_reads.bin"), cfg)
    patterns = load_patterns(data("oneseed_spaced.txt"))

    asm = Assembler(cfg, reads, patterns)
    asm.run_round()
    state = asm.ref.state_dict()
    surviving = list(asm.surviving)
    nfailure = asm.nfailure

    asm2 = Assembler(cfg, ReadStore.from_file(data("synth_reads.bin"), cfg), patterns,
                     ref=ConsensusRef.from_state_dict(state))
    asm2.surviving = surviving
    asm2.nfailure = nfailure
    out2 = io.StringIO()
    while asm2.nfailure < len(patterns) and asm2.nround < 29:
        asm2.run_round()
        if asm2.nfailure < len(patterns):
            out2.write("x\n")

    # reference continuation
    asm_full = Assembler(cfg, ReadStore.from_file(data("synth_reads.bin"), cfg), patterns)
    out_full = io.StringIO()
    asm_full.run(out=out_full, log=None)
    final_golden = out_full.getvalue().splitlines()[-1]

    from pacbioassembly_tpu.codec import dna

    assert dna.codes_to_text(asm2.ref.text()) == final_golden


def test_real_reads_toy_pipeline():
    """Toy pipeline on the bundled real PacBio sequences (README.mkd:60-63):
    byte-parity with the reference binary on real noisy data."""
    cfg = AssemblyConfig(
        initial_ref_path=data("real_init.txt"),
        max_round=10,
        pattern_schedule="roundrobin",
        quirk_init_newline=True,
        quirk_seed_at=True,
    )
    reads = ReadStore.from_file(data("real_reads.bin"), cfg)
    patterns = load_patterns(data("oneseed_spaced.txt"))
    asm = Assembler(cfg, reads, patterns)
    out = io.StringIO()
    asm.run(out=out, log=None)
    golden = open(data("golden_consensus_real.txt")).read()
    assert len(out.getvalue()) == len(golden)
    for gc, mc in zip(golden, out.getvalue()):
        assert gc == mc or (gc == "\n" and mc == "T")  # -f newline base artifact
