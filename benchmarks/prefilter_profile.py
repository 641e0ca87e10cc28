"""Profile the fused prefilter dispatch at scale-run batch sizes.

The r3 scale metrics showed prefilter_s LINEAR in the padded batch size
(~1.0 s at B=16384, ~6.5 s at B=65536) while the DP kernel work in those
launches is ~0.1 s — traced to XLA gathers in the dispatch prep (the
static-shift take_along_axis in bitwave's PEQ build, plus the per-element
segment/window gathers in assemble/gather._gather_batch). This script
times the production fused call (`DeviceBatchBuilder.score`) at both
sizes on the real chip, on a synthetic read set shaped like the 4.6 Mb
run (55,200 reads, ~2.5 kb, 1.2 Mb reference window).

Usage: python benchmarks/prefilter_profile.py [--iters 5]
Prints one JSON line {"B16384_s": ..., "B65536_s": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class FakeReads:
    def __init__(self, rng, n, lmin, lmax):
        self.lengths = rng.integers(lmin, lmax, n).astype(np.int64)
        self._codes = [rng.integers(0, 4, l).astype(np.uint8) for l in self.lengths]

    def codes(self, i):
        return self._codes[i]


class FakeRef:
    def __init__(self, rng, n):
        self.buf = rng.integers(0, 4, n + 2).astype(np.uint8)
        self.pre = 1
        self.post = n + 1
        self.beg = 1
        self.version = 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ref-len", type=int, default=1_200_000)
    ap.add_argument("--n-reads", type=int, default=55_200)
    args = ap.parse_args()

    from pacbioassembly_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from pacbioassembly_tpu.assemble.gather import DeviceBatchBuilder
    from pacbioassembly_tpu.config import AssemblyConfig

    cfg = AssemblyConfig()
    rng = np.random.default_rng(0)
    log("building synthetic reads/ref ...")
    reads = FakeReads(rng, args.n_reads, 1800, 3200)
    ref = FakeRef(rng, args.ref_len)
    builder = DeviceBatchBuilder(reads, cfg)
    assert builder.ok
    log(f"device: {jax.devices()[0]}")

    LBp = cfg.prefilter_len
    Wp = 1 + int(LBp * cfg.prefilter_ratio)
    LAp = LBp + Wp + 1

    out = {}
    for B in (16384, 65536):
        # fresh candidate vectors per iteration (the axon relay caches
        # identical computations)
        def make_vecs(seed):
            r = np.random.default_rng(seed)
            read_row = r.integers(0, args.n_reads, B).astype(np.int32)
            slen = reads.lengths[read_row]
            j = (r.random(B) * (slen - 200)).astype(np.int32)
            fwd = r.random(B) < 0.5
            prel = r.integers(0, args.ref_len - LAp, B).astype(np.int32)
            la = np.full(B, LAp, np.int32)
            return read_row, j, fwd, prel, la

        t0 = time.time()
        builder.score(ref, *make_vecs(1), LA=LAp, LB=LBp, w_max=Wp,
                      ratio=cfg.prefilter_ratio, backend="bitpallas")
        warm = time.time() - t0
        times = []
        for it in range(args.iters):
            vecs = make_vecs(2 + it)
            t0 = time.time()
            builder.score(ref, *vecs, LA=LAp, LB=LBp, w_max=Wp,
                          ratio=cfg.prefilter_ratio, backend="bitpallas")
            times.append(time.time() - t0)
        best = float(np.min(times))
        log(f"B={B}: warm/compile {warm:.1f}s, best {best*1000:.0f} ms, "
            f"median {float(np.median(times))*1000:.0f} ms")
        out[f"B{B}_s"] = round(best, 3)
        out[f"B{B}_median_s"] = round(float(np.median(times)), 3)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
