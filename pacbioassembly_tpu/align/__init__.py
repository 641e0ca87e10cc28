from .types import MATCH, INSERT, DELETE, AlignResult, AlignParams
from .banded import align_banded, compute_band_params
from .dispatch import exact_align

__all__ = [
    "MATCH",
    "INSERT",
    "DELETE",
    "AlignResult",
    "AlignParams",
    "align_banded",
    "compute_band_params",
    "exact_align",
]
