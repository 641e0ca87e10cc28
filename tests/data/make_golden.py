"""Generate the synthetic parity dataset and golden outputs.

Run on a machine with the reference binaries compiled in /tmp/refbin
(they are built out-of-tree from /root/reference; see tests/test_pipeline.py
for how the goldens are consumed). The dataset is committed; this script
documents its provenance.

Determinism: the reference spaced_seed is only deterministic when given a
pinned initial reference (-f) AND a single seed pattern (pattern choice is
seeds[rand() % 1] == seeds[0] regardless of srand; spaced_seed.cpp:412).
"""

import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from pacbioassembly_tpu.codec import binary_io, dna

HERE = Path(__file__).parent
REFBIN = Path("/tmp/refbin")

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main():
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, 4000).astype(np.uint8)
    genome_txt = dna.codes_to_text(genome)
    (HERE / "synth_genome.txt").write_text(genome_txt + "\n")

    # 80 forward-strand reads, 600-1200 bp, ~2% substitution error
    reads = []
    for _ in range(80):
        ln = int(rng.integers(600, 1200))
        start = int(rng.integers(0, len(genome) - ln))
        r = genome[start : start + ln].copy()
        nerr = rng.binomial(ln, 0.02)
        pos = rng.choice(ln, size=nerr, replace=False)
        r[pos] = (r[pos] + rng.integers(1, 4, size=nerr)) % 4
        reads.append(r)

    with open(HERE / "synth_reads.bin", "wb") as fh:
        binary_io.write_records(fh, reads)

    # pinned initial reference: middle slice of the genome, weight 1
    init = genome_txt[1500:2300]
    (HERE / "synth_init.txt").write_text(init + "\n1\n")

    # single-pattern seed files
    (HERE / "oneseed_spaced.txt").write_text("111**111*11*1111\n")
    (HERE / "oneseed_full.txt").write_text("1111111111111111\n")

    # golden runs of the reference binary
    for name, seedfile in [
        ("spaced", "oneseed_spaced.txt"),
        ("full", "oneseed_full.txt"),
    ]:
        out = subprocess.run(
            [
                str(REFBIN / "spaced_seed"),
                "-f", str(HERE / "synth_init.txt"),
                "-m", "30",
                str(HERE / "synth_reads.bin"),
                str(HERE / seedfile),
            ],
            capture_output=True,
            text=True,
            check=True,
        )
        (HERE / f"golden_consensus_{name}.txt").write_text(out.stdout)
        (HERE / f"golden_log_{name}.txt").write_text(out.stderr)
        lines = out.stdout.splitlines()
        print(name, "rounds:", len(lines), "final len:", len(lines[-1]) if lines else 0)

    # golden visual_align on the real pairs
    with open(HERE / "real_align.txt") as fh:
        pairs_txt = fh.read()
    out = subprocess.run(
        [str(REFBIN / "visual_align")],
        input=pairs_txt,
        capture_output=True,
        text=True,
    )
    (HERE / "golden_visual.txt").write_text(out.stdout)
    (HERE / "golden_visual_err.txt").write_text(out.stderr)

    # golden locator: map the synthetic reads onto the genome
    reads_txt = "\n".join(dna.codes_to_text(r) for r in reads) + "\n"
    (HERE / "synth_reads.txt").write_text(reads_txt)
    out = subprocess.run(
        [str(REFBIN / "locator"), str(HERE / "synth_genome.txt"), "1111111111111111"],
        input=reads_txt,
        capture_output=True,
        text=True,
        check=True,
    )
    (HERE / "golden_locator.txt").write_text(out.stdout)
    print("locator lines:", len(out.stdout.splitlines()))


def make_variant_goldens():
    """Additional parity configs: different ratio/weight/trials (+dump) and
    a locked-reference run."""
    rng = np.random.default_rng(43)
    genome = rng.integers(0, 4, 3000).astype(np.uint8)
    reads = []
    for _ in range(60):
        ln = int(rng.integers(650, 1000))
        start = int(rng.integers(0, len(genome) - ln))
        r = genome[start : start + ln].copy()
        nerr = rng.binomial(ln, 0.05)
        pos = rng.choice(ln, size=nerr, replace=False)
        r[pos] = (r[pos] + rng.integers(1, 4, size=nerr)) % 4
        reads.append(r)
    with open(HERE / "synth2_reads.bin", "wb") as fh:
        binary_io.write_records(fh, reads)
    (HERE / "synth2_init.txt").write_text(
        dna.codes_to_text(genome[1000:1800]) + "\n5\n"
    )

    # variant B: -r 0.25 -t 16 with dump
    out = subprocess.run(
        [str(REFBIN / "spaced_seed"),
         "-f", str(HERE / "synth2_init.txt"),
         "-r", "0.25", "-t", "16", "-m", "20",
         "-d", str(HERE / "golden_dump_b.txt"),
         str(HERE / "synth2_reads.bin"), str(HERE / "oneseed_full.txt")],
        capture_output=True, text=True, check=True)
    (HERE / "golden_consensus_b.txt").write_text(out.stdout)

    # variant C: locked reference (-l)
    out = subprocess.run(
        [str(REFBIN / "spaced_seed"),
         "-f", str(HERE / "synth2_init.txt"), "-l", "-m", "5",
         str(HERE / "synth2_reads.bin"), str(HERE / "oneseed_full.txt")],
        capture_output=True, text=True, check=True)
    (HERE / "golden_consensus_locked.txt").write_text(out.stdout)
    (HERE / "golden_log_locked.txt").write_text(out.stderr)
    print("variant goldens written")


if __name__ == "__main__":
    if "--variants" in sys.argv:
        make_variant_goldens()
    else:
        main()


def make_real_golden():
    """Toy pipeline on the bundled real PacBio overlap pairs
    (README.mkd:60-63): all 12 sequences as the read set, pair-1 reference
    as the pinned initial reference."""
    lines = (HERE / "real_align.txt").read_text().split()
    with open(HERE / "real_reads.bin", "wb") as fh:
        binary_io.write_records(fh, [dna.text_to_codes(l) for l in lines])
    (HERE / "real_init.txt").write_text(lines[0] + "\n1\n")
    out = subprocess.run(
        [str(REFBIN / "spaced_seed"),
         "-f", str(HERE / "real_init.txt"), "-m", "10",
         str(HERE / "real_reads.bin"), str(HERE / "oneseed_spaced.txt")],
        capture_output=True, text=True, check=True)
    (HERE / "golden_consensus_real.txt").write_text(out.stdout)
    print("real golden:", [len(x) for x in out.stdout.splitlines()])
