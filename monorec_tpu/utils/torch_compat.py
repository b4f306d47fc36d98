"""Weight-layout conversion between torch and flax conventions.

Used by tests (layer-level parity against torch oracles) and by
``tools/convert_pth.py`` (reference ``.pth`` checkpoint -> flax params).
Pure numpy; torch is never imported here.
"""

from __future__ import annotations

import numpy as np


def conv_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, I, O), spatially flipped (flax does not flip the kernel;
    torch's transposed conv does)."""
    k = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
    return np.ascontiguousarray(k)
