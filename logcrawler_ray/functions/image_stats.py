"""Per-image quality statistics: brightness, blurredness, resolution.

Mirrors the reference's stats stage (reference: 13_calculate_image_stats.py:
32-35 ``calculate_blurredness`` = variance of the Laplacian, :86-97
brightness = mean of the grayscale image, resolution = "WxH" string) without
cv2: the Laplacian uses the same 3x3 kernel [[0,1,0],[1,-4,1],[0,1,0]] that
``cv2.Laplacian(img, CV_64F)`` applies, with edge replication.

Batched over (N, h, w) stacks of identical dims — one vectorized pass.
"""

from __future__ import annotations

import numpy as np


def laplacian(gray: np.ndarray) -> np.ndarray:
    """(N, h, w) float -> (N, h, w) Laplacian with replicated borders.

    Dtype-preserving (float32 in the decode hot path); accumulates in-place
    to avoid the 5 temporaries of the naive expression.
    """
    padded = np.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="edge")
    out = padded[:, :-2, 1:-1].copy()
    out += padded[:, 2:, 1:-1]
    out += padded[:, 1:-1, :-2]
    out += padded[:, 1:-1, 2:]
    out -= 4.0 * gray
    return out


def blurredness_batch(gray: np.ndarray) -> np.ndarray:
    """Variance of the Laplacian per image (13_calculate_image_stats.py:32-35).

    Accepts float32 luma; variance accumulates in float64 for stability.
    """
    lap = laplacian(gray)
    return lap.var(axis=(1, 2), dtype=np.float64)


def brightness_batch(gray: np.ndarray) -> np.ndarray:
    """Mean gray level per image (13_calculate_image_stats.py:88)."""
    return gray.mean(axis=(1, 2), dtype=np.float64)
