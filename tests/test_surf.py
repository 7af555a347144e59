"""SURF tests (reference analog: synthetic blob checks as for SIFT)."""

import numpy as np

from mve_tpu.sfm.surf import detect_and_describe, SurfOptions
from mve_tpu.sfm import matching as M

from tests.test_features import _blob_image


def _u8(img):
    return (img / img.max() * 255).astype(np.uint8)


def test_surf_detects_blobs():
    img, blobs = _blob_image()
    res = detect_and_describe(_u8(img))
    assert len(res) >= 4
    hits = 0
    for by, bx, bs in blobs:
        d = np.hypot(res.x - bx, res.y - by)
        if d.min() < 3.0:
            hits += 1
    assert hits >= len(blobs) - 1
    np.testing.assert_allclose(np.linalg.norm(res.descriptors, axis=1), 1.0, atol=1e-4)


def test_surf_shift_equivariance():
    img1, _ = _blob_image()
    img2, _ = _blob_image(shift=(5, 2))
    r1 = detect_and_describe(_u8(img1))
    r2 = detect_and_describe(_u8(img2))
    pairs = M.match_pair(r1.descriptors, r2.descriptors,
                         M.MatchingOptions(lowe_ratio_threshold=0.7))
    assert len(pairs) >= 3
    dx = r2.x[pairs[:, 1]] - r1.x[pairs[:, 0]]
    dy = r2.y[pairs[:, 1]] - r1.y[pairs[:, 0]]
    assert abs(np.median(dx) - 5) < 1.5
    assert abs(np.median(dy) - 2) < 1.5


def test_surf_upright():
    img, _ = _blob_image()
    res = detect_and_describe(_u8(img), SurfOptions(use_upright_descriptor=True))
    assert len(res) >= 4
    np.testing.assert_allclose(res.orientation, 0.0)


def test_surf_batch_matches_per_view():
    """detect_and_describe_batch (the sfmrecon path) agrees with the
    per-view driver: same keypoints within rounding, high descriptor
    overlap."""
    import numpy as np

    from mve_tpu.sfm.surf import detect_and_describe, detect_and_describe_batch
    from tests.synthetic import make_texture, make_cameras, render_view

    tex = make_texture(seed=5)
    cams = make_cameras(2, seed=5)
    imgs = [render_view(tex, c, 160, 120) for c in cams]
    batch = detect_and_describe_batch(imgs)
    for img, rb in zip(imgs, batch):
        rs = detect_and_describe(img)
        assert abs(len(rb.x) - len(rs.x)) <= 0.05 * max(len(rs.x), 1), \
            (len(rb.x), len(rs.x))
        # Match by position: each batch keypoint has a per-view twin.
        if len(rs.x) and len(rb.x):
            d = np.hypot(rb.x[:, None] - rs.x[None, :],
                         rb.y[:, None] - rs.y[None, :])
            nn = d.min(axis=1)
            assert (nn < 0.5).mean() > 0.95
