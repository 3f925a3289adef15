"""Bounding-box geometry + patch classification (reference patch_exporter).

Pure vectorized kernels mirroring:
- BoundingBox.intersection / area semantics (reference:
  patch_exporter/tests.py:6-55 spec; symmetric, None when disjoint);
- LabelStudio percent -> pixel conversion (patch_exporter/main.py:148-187);
- border-clamped patch crop (patch_exporter/PatchExecutor.py:377-402);
- best-overlap max-join with 'gt' or 'patch' denominator
  (patch_exporter/PatchExecutor.py:178-258);
- hierarchical patch classification ball > penalty > robot > other at
  intersect-ratio threshold 0.2 (patch_exporter/PatchExecutor.py:440-502).
"""

from __future__ import annotations

import numpy as np

CLASS_PRECEDENCE = ("ball", "penalty", "robot")
INTERSECT_THRESHOLD = 0.2


def intersection_area(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) [x0,y0,x1,y1] -> (N,M) intersection areas (0 if disjoint)."""
    ax0, ay0, ax1, ay1 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx0, by0, bx1, by1 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    iw = np.minimum(ax1, bx1) - np.maximum(ax0, bx0)
    ih = np.minimum(ay1, by1) - np.maximum(ay0, by0)
    return np.clip(iw, 0, None) * np.clip(ih, 0, None)


def area(boxes: np.ndarray) -> np.ndarray:
    return np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None)


def percent_to_pixels(boxes_pct: np.ndarray, img_w: int, img_h: int) -> np.ndarray:
    """LabelStudio (x%, y%, w%, h%) -> pixel [x0,y0,x1,y1] (main.py:148-187)."""
    x0 = boxes_pct[:, 0] / 100.0 * img_w
    y0 = boxes_pct[:, 1] / 100.0 * img_h
    return np.stack([
        x0, y0,
        x0 + boxes_pct[:, 2] / 100.0 * img_w,
        y0 + boxes_pct[:, 3] / 100.0 * img_h,
    ], axis=1)


def clamp_crop(img: np.ndarray, box: tuple[int, int, int, int],
               extra_border: int = 0) -> np.ndarray:
    """Crop with edge clamping (PatchExecutor.py:377-402): the requested
    window (grown by extra_border) is clipped to the image."""
    h, w = img.shape[:2]
    x0, y0, x1, y1 = box
    x0 = max(0, x0 - extra_border)
    y0 = max(0, y0 - extra_border)
    x1 = min(w, x1 + extra_border)
    y1 = min(h, y1 + extra_border)
    return img[y0:y1, x0:x1]


def best_overlap(patches: np.ndarray, gts: np.ndarray,
                 denominator: str = "gt") -> tuple[np.ndarray, np.ndarray]:
    """For each patch, the gt index with max intersect ratio and that ratio.

    ratio = intersection / area(gt) or / area(patch)
    (PatchExecutor.py:178-258). Returns (-1, 0.0) rows when gts is empty."""
    n = len(patches)
    if len(gts) == 0:
        return np.full(n, -1, dtype=np.int64), np.zeros(n)
    inter = intersection_area(patches, gts)
    denom = area(gts)[None, :] if denominator == "gt" else area(patches)[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(denom > 0, inter / denom, 0.0)
    best = ratio.argmax(axis=1)
    return best.astype(np.int64), ratio[np.arange(n), best]


def classify_patches(patches: np.ndarray, gt_boxes: np.ndarray,
                     gt_labels: list[str],
                     threshold: float = INTERSECT_THRESHOLD) -> list[str]:
    """Hierarchical classification: first class in ball > penalty > robot
    whose best-overlap ratio >= threshold wins, else 'other'
    (PatchExecutor.py:440-502)."""
    labels_arr = np.array(gt_labels)
    out = []
    for p in patches:
        chosen = "other"
        for cls in CLASS_PRECEDENCE:
            sel = labels_arr == cls
            if not sel.any():
                continue
            _, ratio = best_overlap(p[None, :], gt_boxes[sel])
            if ratio[0] >= threshold:
                chosen = cls
                break
        out.append(chosen)
    return out


def overlap_pairs(boxes: np.ndarray, labels: list[str],
                  min_area: float = 100.0) -> list[tuple[int, int, float]]:
    """Within-image O(n^2) self-join: overlapping pairs with intersection
    area >= min_area across DIFFERENT labels
    (scripts/check_bbox_overlap_tasks.py:68-87, :133-142 — small
    intersections under 100 px^2 are discarded)."""
    inter = intersection_area(boxes, boxes)
    out = []
    n = len(boxes)
    for i in range(n):
        for j in range(i + 1, n):
            if labels[i] != labels[j] and inter[i, j] >= min_area:
                out.append((i, j, float(inter[i, j])))
    return out
