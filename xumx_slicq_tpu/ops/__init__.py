"""Numerical ops: frequency scales, NSGT filterbank design, the sliced
Constant-Q transform (sliCQT), Wiener-EM post-filtering, and BSS-eval metrics.

Plan construction (scales/filterbank/index tables) is host-side NumPy; the
transforms themselves are pure JAX functions over static-shape arrays.
"""

from .fscale import (
    Scale,
    BarkScale,
    MelScale,
    LogScale,
    LinScale,
    MRSTFTScale,
    make_scale,
)
from .filterbank import design_filterbank, FilterbankPlan
from .slicqt import SliCQT, make_slicqt

__all__ = [
    "Scale",
    "BarkScale",
    "MelScale",
    "LogScale",
    "LinScale",
    "MRSTFTScale",
    "make_scale",
    "design_filterbank",
    "FilterbankPlan",
    "SliCQT",
    "make_slicqt",
]
