"""Global neighbor-view selection (reference:
libs/dmrecon/global_view_selection.cc:34-104).

Greedy max-benefit selection of up to global_vs_max views. Benefit of a
candidate = sum over features shared with the reference view of
   parallax-weight(ref) x resolution-ratio-weight x
   prod over already-selected views seeing the feature of parallax-weight,
with parallax weight (plx/10)^2 below min_parallax degrees and
resolution weight ratio = footprint_ref/footprint_cand clamped per the
reference. Feature loops are vectorized with numpy.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _parallax_deg(points, center_a, center_b):
    """Angle (deg) at each point between the two camera centers."""
    va = center_a - points
    vb = center_b - points
    va = va / np.maximum(np.linalg.norm(va, axis=-1, keepdims=True), 1e-30)
    vb = vb / np.maximum(np.linalg.norm(vb, axis=-1, keepdims=True), 1e-30)
    cos = np.clip(np.sum(va * vb, axis=-1), -1.0, 1.0)
    return np.rad2deg(np.arccos(cos))


def _footprint(points, camera, width, height):
    """World-space size of one pixel at each point (depthmap.h
    pixel_footprint): z-depth / focal-in-pixels."""
    K = camera.calibration(width, height)
    R, t = camera.rot, camera.trans
    z = (points @ R.T + t)[:, 2]
    return np.abs(z) / K[0, 0]


def global_view_selection(
    feature_positions: np.ndarray,      # (F, 3) bundle feature positions
    feature_vis: np.ndarray,            # (V, F) bool visibility per view
    cameras: Sequence,                  # CameraInfo per view
    sizes: Sequence,                    # (width, height) per view
    ref_view: int,
    max_views: int = 20,
    min_parallax: float = 10.0,
) -> List[int]:
    V = len(cameras)
    valid = np.array([c is not None and c.valid for c in cameras])
    valid[ref_view] = False
    centers = np.stack([
        c.camera_pos() if (c is not None and c.valid) else np.zeros(3)
        for c in cameras])

    shared = feature_vis & feature_vis[ref_view][None, :]  # (V, F)
    ref_fp = _footprint(feature_positions, cameras[ref_view], *sizes[ref_view])

    # Precompute per-candidate static scores (parallax-to-ref x resolution).
    static_scores = np.zeros((V, feature_positions.shape[0]), np.float64)
    for i in range(V):
        if not valid[i] or not shared[i].any():
            continue
        idx = np.nonzero(shared[i])[0]
        pts = feature_positions[idx]
        plx = _parallax_deg(pts, centers[ref_view], centers[i])
        score = np.where(plx < min_parallax, (plx / 10.0) ** 2, 1.0)
        fp = _footprint(pts, cameras[i], *sizes[i])
        ratio = ref_fp[idx] / np.maximum(fp, 1e-30)
        ratio = np.where(ratio > 2.0, 2.0 / ratio, np.minimum(ratio, 1.0))
        static_scores[i, idx] = score * ratio

    selected: List[int] = []
    available = valid.copy()
    # Diversity multiplier accumulated as views are selected.
    diversity = np.ones((V, feature_positions.shape[0]), np.float64)
    while len(selected) < max_views:
        benefits = np.where(
            available[:, None], static_scores * diversity, 0.0).sum(axis=1)
        best = int(np.argmax(benefits))
        if benefits[best] <= 0.0:
            break
        selected.append(best)
        available[best] = False
        # Update diversity: features seen by `best` get parallax weight
        # w.r.t. the new selection for every remaining candidate.
        idx = np.nonzero(feature_vis[best])[0]
        if len(idx) == 0:
            continue
        pts = feature_positions[idx]
        for i in np.nonzero(available)[0]:
            both = shared[i, idx]
            if not both.any():
                continue
            sub = idx[both]
            plx = _parallax_deg(feature_positions[sub], centers[best], centers[i])
            w = np.where(plx < min_parallax, (plx / 10.0) ** 2, 1.0)
            diversity[i, sub] *= w
    return selected
