"""Randomized differential fuzzing: exact engine vs the compiled reference.

Not part of the default suite (needs the reference binaries compiled in
/tmp/refbin — see tests/data/make_golden.py provenance). Run manually:

    python tests/fuzz_reference_parity.py [n_trials]

Each trial draws a random dataset + config (genome size, error rate, ratio,
trials, weight), runs both implementations with pinned determinism, and
asserts byte-parity of the per-round consensus stream (modulo the
documented '\\n'-as-base artifact of the -f path).
"""

import io
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pacbioassembly_tpu.assemble import Assembler, ReadStore
from pacbioassembly_tpu.codec import binary_io, dna
from pacbioassembly_tpu.codec.dna import load_patterns
from pacbioassembly_tpu.config import AssemblyConfig

REFBIN = "/tmp/refbin/spaced_seed"


def one_trial(seed: int) -> str:
    rng = np.random.default_rng(seed)
    G = int(rng.integers(1500, 6000))
    genome = rng.integers(0, 4, G).astype(np.uint8)
    n_reads = int(rng.integers(20, 120))
    err = float(rng.uniform(0.0, 0.08))
    ratio = float(rng.choice([0.2, 0.25, 0.3, 0.35]))
    trials = int(rng.choice([8, 16, 32]))
    weight = int(rng.choice([1, 2, 5]))
    pattern = str(rng.choice(["1111111111111111", "111**111*11*1111", "11*11*1*1*11*111"]))

    reads = []
    for _ in range(n_reads):
        ln = int(rng.integers(550, min(1500, G)))
        s = int(rng.integers(0, G - ln + 1))
        r = genome[s : s + ln].copy()
        nerr = rng.binomial(ln, err)
        pos = rng.choice(ln, size=nerr, replace=False)
        r[pos] = (r[pos] + rng.integers(1, 4, size=nerr)) % 4
        reads.append(r)

    init_lo = int(rng.integers(0, G - 700))
    init = dna.codes_to_text(genome[init_lo : init_lo + 700])

    with tempfile.TemporaryDirectory() as tmp:
        binp = os.path.join(tmp, "reads.bin")
        with open(binp, "wb") as fh:
            binary_io.write_records(fh, reads)
        initp = os.path.join(tmp, "init.txt")
        open(initp, "w").write(init + f"\n{weight}\n")
        seedp = os.path.join(tmp, "seed.txt")
        open(seedp, "w").write(pattern + "\n")

        ref_out = subprocess.run(
            [REFBIN, "-f", initp, "-r", str(ratio), "-t", str(trials), "-m", "25",
             binp, seedp],
            capture_output=True, text=True, timeout=300,
        ).stdout

        cfg = AssemblyConfig(
            initial_ref_path=initp, ratio=ratio, max_trial=trials, max_round=25,
            pattern_schedule="roundrobin", quirk_init_newline=True,
            quirk_seed_at=True, quirk_stale_dp=True,
        )
        asm = Assembler(cfg, ReadStore.from_file(binp, cfg), load_patterns(seedp))
        out = io.StringIO()
        asm.run(out=out, log=None)
        mine = out.getvalue()

    if len(mine) != len(ref_out):
        return (f"LENGTH seed={seed} ratio={ratio} t={trials} w={weight} "
                f"err={err:.3f} ref={len(ref_out)} mine={len(mine)}")
    for gi, (gc, mc) in enumerate(zip(ref_out, mine)):
        if gc != mc and not (gc == "\n" and mc == "T"):
            return f"DIFF seed={seed} at char {gi}: ref={gc!r} mine={mc!r}"
    return ""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    fails = 0
    for seed in range(n):
        msg = one_trial(seed)
        status = msg or "ok"
        print(f"trial {seed}: {status}", flush=True)
        if msg:
            fails += 1
    print(f"{n - fails}/{n} trials byte-parity")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
