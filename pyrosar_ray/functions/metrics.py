"""Quality metrics: PSNR for the per-row pixel-parity invariant.

BASELINE.json `input_hint`: decoded pixels must be allclose vs the
reference, with PSNR ≥ 40 dB allowed for lossy formats. Lossless paths
(raw arrays here) must be exactly equal; this module provides the check
both the tests and any lossy re-encode stage use.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB; +inf for identical arrays."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def pixels_match(a: np.ndarray, b: np.ndarray, lossy: bool, min_psnr: float = 40.0) -> bool:
    """The input_hint invariant: exact for lossless, PSNR ≥ 40 dB for lossy."""
    if lossy:
        return psnr(a, b) >= min_psnr
    return np.array_equal(a, b)
