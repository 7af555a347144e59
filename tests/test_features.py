"""SIFT + matching tests on synthetic imagery (reference analog:
tests/sfm/gtest_matching.cc plus manual _test_features.cc visual checks,
here made assertable with known-geometry synthetic images)."""

import numpy as np

from mve_tpu.sfm.sift import detect_and_describe, SiftOptions
from mve_tpu.sfm import matching as M


def _blob_image(H=300, W=380, seed=0, shift=(0, 0)):
    """Blobs with scales small enough that descriptor windows stay inside
    every octave image (big scales near borders are boundary-rejected by
    SIFT — in the reference just the same, sift.cc:745-748)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W), np.float32)
    # Blob sigmas chosen so the scale-space extremum falls mid-band: a
    # blob whose DoG extremum lands exactly at an octave boundary (abs
    # scale 1.6*2^(4/3) ~ 4.03, e.g. sigma=5) sits on a flat crack of the
    # discrete 26-neighbor test and is (correctly) not detected.
    blobs = [(110, 120, 4), (150, 250, 7), (200, 140, 6), (120, 300, 3), (90, 200, 3.5)]
    for by, bx, bs in blobs:
        img += np.exp(-((yy - by - shift[1]) ** 2 + (xx - bx - shift[0]) ** 2) / (2 * bs**2))
    img += rng.rand(H, W).astype(np.float32) * 0.01
    return img, blobs


def test_sift_detects_blobs():
    img, blobs = _blob_image()
    res = detect_and_describe(img)
    assert len(res) >= len(blobs) - 1
    hits = 0
    for by, bx, bs in blobs:
        d = np.hypot(res.x - bx, res.y - by)
        if d.min() < 1.5:
            hits += 1
    assert hits >= len(blobs) - 1  # boundary blobs may be rejected
    np.testing.assert_allclose(np.linalg.norm(res.descriptors, axis=1), 1.0, atol=1e-4)


def test_sift_shift_equivariance():
    """Keypoints of a shifted image are shifted keypoints."""
    img1, _ = _blob_image()
    img2, _ = _blob_image(shift=(6, 3))
    r1 = detect_and_describe(img1)
    r2 = detect_and_describe(img2)
    pairs = M.match_pair(r1.descriptors, r2.descriptors)
    assert len(pairs) >= 3
    dx = r2.x[pairs[:, 1]] - r1.x[pairs[:, 0]]
    dy = r2.y[pairs[:, 1]] - r1.y[pairs[:, 0]]
    assert abs(np.median(dx) - 6) < 0.75
    assert abs(np.median(dy) - 3) < 0.75


def test_matching_consistency_logic():
    """Hand-built index arrays (gtest_matching.cc:8-31 style)."""
    res = M.MatchingResult(
        matches_1_2=np.array([0, 2, -1, 1], np.int32),
        matches_2_1=np.array([0, 3, 0, -1], np.int32),
    )
    M.remove_inconsistent_matches(res)
    np.testing.assert_array_equal(res.matches_1_2, [0, -1, -1, 1])
    np.testing.assert_array_equal(res.matches_2_1, [0, 3, -1, -1])
    assert M.count_consistent_matches(res) == 2


def test_lowe_ratio_rejects_ambiguous():
    rng = np.random.RandomState(0)
    d = rng.randn(4, 128).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # set2: first two descriptors nearly identical to d[0] -> ambiguous
    set2 = np.stack([d[0] + 0.01 * d[1], d[0] + 0.011 * d[2], d[3]])
    set2 /= np.linalg.norm(set2, axis=1, keepdims=True)
    m = M.oneway_match(M.MatchingOptions(lowe_ratio_threshold=0.8), d[:1], set2)
    assert m[0] == -1  # ambiguous match rejected
    m2 = M.oneway_match(M.MatchingOptions(lowe_ratio_threshold=1.0), d[:1], set2)
    assert m2[0] in (0, 1)  # disabled ratio test accepts
