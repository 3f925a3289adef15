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

    Dtype-preserving (float32 in the decode hot path). Shifted in-place
    accumulation straight into the output — no padded copy of the input
    (np.pad cost one full extra array write+read per batch; measured ~25%
    of the kernel) and no temporaries beyond the single ``4*gray``.
    Summation order (up+down+left+right-4c) matches the padded version
    element-for-element, so results are bitwise-identical.
    """
    out = np.empty_like(gray)
    out[:, 1:, :] = gray[:, :-1, :]   # up neighbor (row 0 replicates)
    out[:, 0, :] = gray[:, 0, :]
    out[:, :-1, :] += gray[:, 1:, :]  # down neighbor (last row replicates)
    out[:, -1, :] += gray[:, -1, :]
    out[:, :, 1:] += gray[:, :, :-1]  # left neighbor (col 0 replicates)
    out[:, :, 0] += gray[:, :, 0]
    out[:, :, :-1] += gray[:, :, 1:]  # right neighbor (last col replicates)
    out[:, :, -1] += gray[:, :, -1]
    out -= 4.0 * gray
    return out


def blurredness_batch(gray: np.ndarray) -> np.ndarray:
    """Variance of the Laplacian per image (13_calculate_image_stats.py:32-35).

    Accepts float32 luma. Variance is computed from float64 moments in a
    single fused pass (einsum) instead of ``np.var``'s two-pass
    mean-subtract, which allocates a full float64 temporary per batch;
    the Laplacian is zero-mean up to border effects, so the E[x^2]-E[x]^2
    form loses no precision here.
    """
    lap = laplacian(gray)
    n = lap.shape[1] * lap.shape[2]
    flat = lap.reshape(lap.shape[0], n)
    s1 = np.einsum("ij->i", flat, dtype=np.float64)
    s2 = np.einsum("ij,ij->i", flat, flat, dtype=np.float64)
    m = s1 / n
    return s2 / n - m * m


def brightness_batch(gray: np.ndarray) -> np.ndarray:
    """Mean gray level per image (13_calculate_image_stats.py:88)."""
    return gray.mean(axis=(1, 2), dtype=np.float64)
