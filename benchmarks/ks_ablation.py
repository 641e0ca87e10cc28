"""Kogge-Stone wrap-mask ablation on the real TPU (VERDICT r2 item 5).

The bitwave kernel's carry prefix masks every `up(x, sh)` lane roll even
when the mask is provably redundant (NB == 1 and all live words below
L - sh; see align/bitwave.py `up`). r2 measured dropping the masks at
+2% runtime but 63 s Mosaic compiles and kept them; with the persistent
compilation cache the compile is one-time, so this script re-measures
both variants on the bench geometry and checks the accept/cost decisions
are bit-identical.

Single-process: the knob is a module global read at trace time, so the
second variant flips it and clears the jit cache — paying the axon
plugin warm-up (2-12 min first Pallas launch per process) only once.

Usage: python benchmarks/ks_ablation.py [--iters 8]
Prints one JSON line with both rates and the parity verdict.
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


def measure(iters: int, batches, dev_batches, LA, W, ratio):
    import bench

    from pacbioassembly_tpu.align.bitwave import batch_score_bitpallas

    def run(db):
        a, la, b, lb = db
        r = batch_score_bitpallas(a, la, b, lb, la_max=LA, w_max=W, ratio=ratio)
        return np.asarray(r.accept), np.asarray(r.cost)

    t0 = time.time()
    acc0, cost0 = run(dev_batches[0])
    compile_s = time.time() - t0
    times = []
    accs, costs = [acc0], [cost0]
    for db in dev_batches[1:]:
        t = time.time()
        acc, cost = run(db)
        times.append(time.time() - t)
        accs.append(acc)
        costs.append(cost)
    a, la, b, lb, _ = batches[1]
    cells = bench.reference_cells(la, lb, ratio)
    best = float(np.min(times))
    return {
        "gcells": cells / best / 1e9,
        "best_ms": best * 1000,
        "median_ms": float(np.median(times)) * 1000,
        "compile_s": compile_s,
        # parity verdict covers EVERY batch exercised, not just the warm-up
        "accept": np.concatenate(accs),
        "cost": np.concatenate(costs),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from pacbioassembly_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    import bench
    from pacbioassembly_tpu.align import bitwave

    # B=2048 matches bench.py's production-scale geometry (the r4 batch
    # sweep showed smaller batches measure tunnel latency, not the kernel)
    B, LB = 2048, 2048
    ratio = 0.3
    W = 1 + int(LB * ratio)
    LA = LB + W + 1
    rng = np.random.default_rng(0)
    batches = [bench.make_batch(rng, B, LA, LB) for _ in range(args.iters + 1)]
    dev_batches = [tuple(jax.device_put(x) for x in b[:4]) for b in batches]
    log(f"device: {jax.devices()[0]}")

    bitwave._KSMASK = True
    masked = measure(args.iters, batches, dev_batches, LA, W, ratio)
    log(f"masked:   {masked['gcells']:.2f} Gcells/s "
        f"(best {masked['best_ms']:.1f} ms, compile {masked['compile_s']:.1f}s)")

    bitwave.batch_score_bitpallas.clear_cache()
    bitwave._KSMASK = False
    maskless = measure(args.iters, batches, dev_batches, LA, W, ratio)
    log(f"maskless: {maskless['gcells']:.2f} Gcells/s "
        f"(best {maskless['best_ms']:.1f} ms, compile {maskless['compile_s']:.1f}s)")

    same = bool(
        np.array_equal(masked["accept"], maskless["accept"])
        and np.array_equal(masked["cost"], maskless["cost"])
    )
    print(json.dumps({
        "masked_gcells": round(masked["gcells"], 2),
        "maskless_gcells": round(maskless["gcells"], 2),
        "speedup": round(maskless["gcells"] / masked["gcells"], 4),
        "masked_compile_s": round(masked["compile_s"], 1),
        "maskless_compile_s": round(maskless["compile_s"], 1),
        "decisions_identical": same,
    }))
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
