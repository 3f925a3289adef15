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
    """(N, h, w) float -> (N, h, w) Laplacian with replicated borders."""
    padded = np.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="edge")
    return (
        padded[:, :-2, 1:-1]
        + padded[:, 2:, 1:-1]
        + padded[:, 1:-1, :-2]
        + padded[:, 1:-1, 2:]
        - 4.0 * gray
    )


def blurredness_batch(gray: np.ndarray) -> np.ndarray:
    """Variance of the Laplacian per image (13_calculate_image_stats.py:32-35)."""
    lap = laplacian(gray.astype(np.float64))
    return lap.var(axis=(1, 2))


def brightness_batch(gray: np.ndarray) -> np.ndarray:
    """Mean gray level per image (13_calculate_image_stats.py:88)."""
    return gray.mean(axis=(1, 2))
