"""Kogge-Stone runtime-share ablation (VERDICT r4 item 5).

The carry resolution is ~37% of the kernel's vector OPS; this measures
what share of WALL TIME it actually is, by timing the kernel with the
doubling chain truncated to 1 step (PBTPU_BITWAVE_KSDEPTH=1 — wrong
results, identical op structure otherwise) against the exact kernel.
The gap bounds the best case of ANY carry-resolution restructure: if
removing (words-1 -> 1 step) of the chain saves X ms, no reorganization
of those steps can save more than X.

Runs each variant in a SUBPROCESS (the knob is read at import). Uses
maskless mode (PBTPU_BITWAVE_KSMASK=0) for both so compiles stay ~12 s
(the mask knob is runtime-neutral, ks_ablation_r4.json: 1.2%).

Writes one JSON line to stdout.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, %(root)r)
from pacbioassembly_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, bench
from pacbioassembly_tpu.align.bitwave import batch_score_bitpallas

ratio = 0.3; LB = 2048; B = 2048
W = 1 + int(LB * ratio); LA = LB + W + 1
rng = np.random.default_rng(0)
iters = 5
batches = [bench.make_batch(rng, B, LA, LB) for _ in range(iters + 1)]
dev = [tuple(jax.device_put(x) for x in b[:4]) for b in batches]
def run(db):
    a, la, b, lb = db
    r = batch_score_bitpallas(a, la, b, lb, la_max=LA, w_max=W, ratio=ratio)
    return np.asarray(r.accept)
t0 = time.time(); run(dev[0]); warm = time.time() - t0
ts = []
for db in dev[1:]:
    t = time.time(); run(db); ts.append(time.time() - t)
cells = bench.reference_cells(batches[1][1], batches[1][3], ratio)
print(json.dumps({
    "best_ms": round(min(ts) * 1000, 1),
    "median_ms": round(float(np.median(ts)) * 1000, 1),
    "gcells": round(cells / min(ts) / 1e9, 2),
    "compile_s": round(warm, 1),
}))
"""


def run_variant(depth):
    env = dict(os.environ)
    env["PBTPU_BITWAVE_KSMASK"] = "0"
    env["PBTPU_BITWAVE_KSDEPTH"] = str(depth)
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"root": os.path.join(HERE, "..")}],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(1)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    full = run_variant(0)
    print(f"full depth: {full}", file=sys.stderr, flush=True)
    trunc = run_variant(1)
    print(f"depth=1:    {trunc}", file=sys.stderr, flush=True)
    saved = full["best_ms"] - trunc["best_ms"]
    res = {
        "full": full,
        "depth1": trunc,
        "carry_chain_ms": round(saved, 1),
        "carry_chain_share": round(saved / full["best_ms"], 3),
        "note": "depth1 is WRONG-RESULT timing-only; the gap upper-bounds "
                "any carry-resolution restructure's possible saving",
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
