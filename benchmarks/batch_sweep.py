"""Batch-size sweep of the fused bitpallas dispatch: is 22 Gcells/s at
B=256 launch-latency-bound? If so the rate scales with B.

r5: extended to B=4096 (the real SCREEN_CHUNK, assemble/batch.py:48)
and 8192, validating the r4 fit (wall ~ 24 ms + B * 12.5 us) past the
knee or finding the HBM/VMEM limit (VERDICT r4 item 4)."""
import json, sys, time
import numpy as np
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from pacbioassembly_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, bench
from pacbioassembly_tpu.align.bitwave import batch_score_bitpallas

ratio = 0.3; LB = 2048
W = 1 + int(LB*ratio); LA = LB + W + 1
rng = np.random.default_rng(0)
out = {}
for B in (256, 512, 1024, 2048, 4096, 8192):
    iters = 5
    batches = [bench.make_batch(rng, B, LA, LB) for _ in range(iters+1)]
    dev = [tuple(jax.device_put(x) for x in b[:4]) for b in batches]
    def run(db):
        a, la, b, lb = db
        r = batch_score_bitpallas(a, la, b, lb, la_max=LA, w_max=W, ratio=ratio)
        return np.asarray(r.accept)
    t0=time.time(); run(dev[0]); warm=time.time()-t0
    ts=[]
    for db in dev[1:]:
        t=time.time(); run(db); ts.append(time.time()-t)
    cells = bench.reference_cells(batches[1][1], batches[1][3], ratio)
    best=min(ts)
    print(f"B={B}: warm {warm:.1f}s best {best*1000:.1f}ms median {np.median(ts)*1000:.1f}ms -> {cells/best/1e9:.2f} Gcells/s", file=sys.stderr, flush=True)
    out[f"B{B}"] = {"best_ms": round(best*1000,1), "median_ms": round(float(np.median(ts))*1000,1), "gcells": round(cells/best/1e9,2)}
print(json.dumps(out))
