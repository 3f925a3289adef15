"""64-bit DCT perceptual hash (pHash), pure numpy, batch-vectorized.

The reference has no near-dup operator (SURVEY.md §2.6 O7 — its closest-frame
join is time-based); the north rule adds phash-keyed dedup as a first-class
column of the image table, so this implementation is the engine's canonical
one: gray -> area-mean resize to 32x32 -> 2D DCT-II -> top-left 8x8 minus DC
-> median threshold -> 64 bits.

``phash_batch`` hashes N images of *identical* dims in one batched matmul
(N, 32, 32) x DCT matrices — images of mixed sizes are grouped by (w, h)
by the caller (see stages/decode.py).
"""

from __future__ import annotations

import numpy as np

_N = 32  # resize target
_K = 8  # low-frequency block

_BITS = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(1, 64)


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    m = np.cos(np.pi / n * (i + 0.5) * k)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT = _dct_matrix(_N)
_DCT_T = _DCT.T.copy()


def grayscale(rgb: np.ndarray) -> np.ndarray:
    """(..., h, w, 3) uint8 RGB -> (..., h, w) float32 luma (ITU-R 601)."""
    arr = rgb.astype(np.float32)
    return 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]


def area_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(N, h, w) float -> (N, out_h, out_w) via area-mean pooling.

    Works for arbitrary h, w (bins via reduceat), fully vectorized over N.
    (A BLAS-matmul variant was measured SLOWER single-threaded — the shape
    Ray tasks run in — so the reduceat pass stays.)
    """
    n, h, w = gray.shape
    row_edges = (np.arange(out_h) * h) // out_h
    col_edges = (np.arange(out_w) * w) // out_w
    row_counts = np.diff(np.append(row_edges, h)).astype(np.float32)
    col_counts = np.diff(np.append(col_edges, w)).astype(np.float32)
    pooled = np.add.reduceat(gray, row_edges, axis=1)
    pooled = np.add.reduceat(pooled, col_edges, axis=2)
    pooled /= row_counts[None, :, None]
    pooled /= col_counts[None, None, :]
    return pooled


def phash_batch(rgb: np.ndarray) -> np.ndarray:
    """(N, h, w, 3) uint8 RGB -> (N,) uint64 phash."""
    return phash_from_gray(grayscale(rgb))


def phash_from_gray(gray: np.ndarray) -> np.ndarray:
    """(N, h, w) float luma -> (N,) uint64 phash (reuses a precomputed
    grayscale so decode stages run luma extraction once per batch)."""
    n = len(gray)
    small = area_resize(gray, _N, _N).astype(np.float64)
    freq = _DCT @ small @ _DCT_T  # (N, 32, 32)
    block = freq[:, :_K, :_K].reshape(n, _K * _K)
    coeffs = block[:, 1:]  # drop DC
    med = np.median(coeffs, axis=1, keepdims=True)
    bits = (coeffs > med).astype(np.uint64)
    padded = np.concatenate([np.zeros((n, 1), dtype=np.uint64), bits], axis=1)
    return (padded * _BITS).sum(axis=1, dtype=np.uint64)


def phash_one(rgb: np.ndarray) -> int:
    return int(phash_batch(rgb[None, ...])[0])


def hamming_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise popcount(a ^ b) over uint64 arrays."""
    x = (a ^ b).view(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.uint8)
    bytes_view = x.view(np.uint8).reshape(*x.shape, 8)
    return np.unpackbits(bytes_view, axis=-1).sum(axis=-1).astype(np.uint8) + cnt
