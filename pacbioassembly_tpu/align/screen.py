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
