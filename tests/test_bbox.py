"""BBox geometry tests — mirrors the reference's ONLY real unit tests
(patch_exporter/tests.py:6-55: partial overlap, disjoint, containment,
identical, symmetry, exact areas)."""

import numpy as np
import pytest

from logcrawler_ray.functions import bbox


def test_partial_overlap_exact_area():
    a = np.array([[0, 0, 10, 10]], dtype=float)
    b = np.array([[5, 5, 15, 15]], dtype=float)
    assert bbox.intersection_area(a, b)[0, 0] == 25.0
    assert bbox.intersection_area(b, a)[0, 0] == 25.0  # symmetric


def test_disjoint_zero():
    a = np.array([[0, 0, 10, 10]], dtype=float)
    b = np.array([[20, 20, 30, 30]], dtype=float)
    assert bbox.intersection_area(a, b)[0, 0] == 0.0


def test_containment():
    a = np.array([[0, 0, 10, 10]], dtype=float)
    b = np.array([[2, 2, 4, 4]], dtype=float)
    assert bbox.intersection_area(a, b)[0, 0] == 4.0


def test_identical():
    a = np.array([[1, 1, 5, 9]], dtype=float)
    assert bbox.intersection_area(a, a)[0, 0] == bbox.area(a)[0] == 32.0


def test_percent_to_pixels():
    pct = np.array([[10.0, 20.0, 50.0, 25.0]])  # x%, y%, w%, h%
    px = bbox.percent_to_pixels(pct, 640, 480)
    assert px.tolist() == [[64.0, 96.0, 384.0, 216.0]]


def test_clamp_crop():
    img = np.arange(100).reshape(10, 10)
    out = bbox.clamp_crop(img, (8, 8, 12, 12), extra_border=1)
    assert out.shape == (3, 3)  # clamped to image edge
    inner = bbox.clamp_crop(img, (2, 2, 4, 4))
    assert inner.shape == (2, 2)


def test_best_overlap_denominators():
    patches = np.array([[0, 0, 10, 10]], dtype=float)
    gts = np.array([[0, 0, 5, 5], [0, 0, 20, 20]], dtype=float)
    idx_gt, r_gt = bbox.best_overlap(patches, gts, "gt")
    assert idx_gt[0] == 0 and r_gt[0] == 1.0  # small gt fully covered
    idx_p, r_p = bbox.best_overlap(patches, gts, "patch")
    assert idx_p[0] == 1 and r_p[0] == 1.0  # patch fully inside big gt
    idx_e, r_e = bbox.best_overlap(patches, np.zeros((0, 4)))
    assert idx_e[0] == -1 and r_e[0] == 0.0


def test_classify_precedence():
    gt = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=float)
    labels = ["robot", "ball"]
    # overlaps both equally -> ball wins (precedence)
    out = bbox.classify_patches(np.array([[0, 0, 10, 10]], dtype=float), gt, labels)
    assert out == ["ball"]
    # no overlap -> other
    out2 = bbox.classify_patches(np.array([[100, 100, 110, 110]], dtype=float), gt, labels)
    assert out2 == ["other"]
    # below threshold -> other (ratio = 4/100 < 0.2)
    out3 = bbox.classify_patches(np.array([[8, 8, 30, 30]], dtype=float),
                                 np.array([[0, 0, 10, 10]], dtype=float), ["ball"])
    assert out3 == ["other"]


def test_overlap_pairs_min_area_and_labels():
    boxes = np.array([
        [0, 0, 20, 20],
        [10, 10, 30, 30],   # overlap 100 with 0
        [19, 19, 40, 40],   # overlap 1 with 0 (too small)
        [0, 0, 20, 20],     # same label as 0
    ], dtype=float)
    labels = ["a", "b", "b", "a"]
    pairs = bbox.overlap_pairs(boxes, labels, min_area=100.0)
    assert (0, 1, 100.0) in pairs
    assert all(not (i == 0 and j == 3) for i, j, _ in pairs)  # same label skipped
    assert all(a >= 100 for _, _, a in pairs)
