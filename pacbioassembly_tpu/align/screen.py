"""Device screening dispatch: score batches of candidate alignments.

Chooses the Pallas TPU kernel on TPU backends and the lax.scan scorer
elsewhere (both produce bit-identical decisions; tests assert it). Batches
are size-bucketed by the caller so each (la_max, w_max) pair compiles once.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import Constants
from .scan import BatchScores, batch_score

_backend_cache: Optional[str] = None

# Batch quantum: every score_batch call pads B up a geometric ladder
# (quantum, 2*quantum, 4*quantum, ...) so the jitted scorers see a handful
# of distinct shapes total instead of one per round — each distinct B
# retraces + recompiles (~5-11 s of Mosaic/XLA per shape on the tunneled
# TPU; measured to dominate end-to-end assembly time before this). 64 =
# the bit-parallel kernel's sublane group; padding rows carry la=lb=1 so
# the kernel's early exit makes them nearly free.
BATCH_QUANTUM = 64


def ladder_size(B: int, quantum: int = BATCH_QUANTUM) -> int:
    """Smallest quantum * 2^k >= B (>= quantum)."""
    n = -(-max(B, 1) // quantum)  # ceil units
    return quantum * (1 << (n - 1).bit_length())


def pad_batch(arrs_2d, la, lb, quantum: int = BATCH_QUANTUM, ladder: bool = True):
    """Pad the leading batch dim of (a, b) + length vectors to a ladder step
    (or plain multiple when ladder=False). Pad rows get la=lb=1 (cheap,
    rejected, sliced off by the caller)."""
    B0 = len(la)
    target = ladder_size(B0, quantum) if ladder else B0 + ((-B0) % quantum)
    pad = target - B0
    if pad == 0:
        return arrs_2d, la, lb, B0
    arrs_2d = [np.pad(x, ((0, pad), (0, 0))) for x in arrs_2d]
    la = np.pad(la, (0, pad), constant_values=1)
    lb = np.pad(lb, (0, pad), constant_values=1)
    return arrs_2d, la, lb, B0


def screening_backend() -> str:
    """'bitpallas' on TPU (the bit-parallel kernel), 'scan' otherwise;
    override with PBTPU_SCREEN_BACKEND (bitpallas | pallas | scan)."""
    global _backend_cache
    if _backend_cache is None:
        forced = os.environ.get("PBTPU_SCREEN_BACKEND")
        if forced:
            _backend_cache = forced
        else:
            import jax

            try:
                platform = jax.devices()[0].platform
            except Exception:
                platform = "cpu"
            _backend_cache = "bitpallas" if platform == "tpu" else "scan"
    return _backend_cache


def score_batch(
    a: np.ndarray,
    la: np.ndarray,
    b: np.ndarray,
    lb: np.ndarray,
    *,
    la_max: int,
    w_max: int,
    ratio: float = Constants.MAXR,
    maxn: int = Constants.ALIGNER_MAXN,
    maxm: int = Constants.ALIGNER_MAXM,
    backend: Optional[str] = None,
) -> BatchScores:
    backend = backend or screening_backend()
    if isinstance(a, np.ndarray):
        (a, b), la, lb, B0 = pad_batch(
            [np.asarray(a), np.asarray(b)], np.asarray(la), np.asarray(lb)
        )
    else:
        # device arrays (assemble/gather.py): the caller already laddered
        # the batch on host, so no host-side pad/copy here
        B0 = a.shape[0]
    res = _dispatch(a, la, b, lb, la_max=la_max, w_max=w_max, ratio=ratio,
                    maxn=maxn, maxm=maxm, backend=backend)
    if len(res.accept) != B0:
        res = BatchScores(*(x[:B0] for x in res))
    return res


def _dispatch(a, la, b, lb, *, la_max, w_max, ratio, maxn, maxm, backend) -> BatchScores:
    if backend == "bitpallas" or backend == "bitpallas_interpret":
        from .bitwave import batch_score_bitpallas

        return batch_score_bitpallas(
            a, la, b, lb,
            la_max=la_max, w_max=w_max, ratio=ratio, maxn=maxn, maxm=maxm,
            interpret=(backend == "bitpallas_interpret"),
        )
    if backend == "pallas" or backend == "pallas_interpret":
        from .wavefront import batch_score_pallas

        return batch_score_pallas(
            a, la, b, lb,
            la_max=la_max, w_max=w_max, ratio=ratio, maxn=maxn, maxm=maxm,
            interpret=(backend == "pallas_interpret"),
        )
    return batch_score(
        a, la, b, lb, la_max=la_max, w_max=w_max, ratio=ratio, maxn=maxn, maxm=maxm
    )


def size_bucket(lb: int, ratio: float, buckets=(256, 512, 1024, 2048, 4096, 8192, 16384, 20001)):
    """Static (LB, la_max, w_max) bucket for a segment of length lb."""
    for cap in buckets:
        if lb <= cap:
            w = 1 + int(cap * ratio)
            return cap, cap + w + 1, w
    cap = buckets[-1]
    w = 1 + int(cap * ratio)
    return cap, cap + w + 1, w
