"""End-to-end incremental SfM on a synthetic scene — the integration test
the reference lacks (SURVEY.md §4 calls for adding it)."""

import numpy as np

from mve_tpu.sfm.bundler import Viewport, TwoViewMatching
from mve_tpu.sfm.bundler.pipeline import run_incremental_sfm, SfmOptions
from mve_tpu.sfm.bundler.incremental import _determine_similarity
from mve_tpu.math.rotation import rodrigues_to_matrix


def _make_synthetic_problem(n_views=6, n_points=120, seed=0, noise=0.0005):
    """Cameras on an arc looking at a cloud; viewports get projected
    feature positions, matching comes from ground-truth identity."""
    rng = np.random.RandomState(seed)
    pts = rng.rand(n_points, 3) * 2 - 1
    pts[:, 2] += 6.0

    cams = []
    for i in range(n_views):
        angle = (i - n_views / 2) * 0.12
        R = np.asarray(rodrigues_to_matrix(np.array([0.0, angle, 0.0])), np.float64)
        center = np.array([1.5 * np.sin(angle) * 4, 0.1 * i, 6.0 - 4 * np.cos(angle)])
        t = -R @ center
        cams.append((0.85, R, t))

    viewports = []
    vis = []  # per view: (feature_id -> point_id), positions
    for f, R, t in cams:
        pc = (R @ pts.T).T + t
        uv = pc[:, :2] / pc[:, 2:] * f
        visible = (np.abs(uv[:, 0]) < 0.5) & (np.abs(uv[:, 1]) < 0.5) & (pc[:, 2] > 0)
        ids = np.nonzero(visible)[0]
        vp = Viewport()
        vp.focal_length = f
        vp.positions = (uv[ids] + rng.randn(len(ids), 2) * noise).astype(np.float32)
        vp.colors = np.full((len(ids), 3), 128, np.uint8)
        vp.track_ids = np.full(len(ids), -1, np.int32)
        viewports.append(vp)
        vis.append(ids)

    matching = []
    for a in range(n_views):
        for b in range(a + 1, n_views):
            ids_a, ids_b = vis[a], vis[b]
            common, ia, ib = np.intersect1d(ids_a, ids_b, return_indices=True)
            if len(common) < 24:
                continue
            matching.append(TwoViewMatching(a, b, np.stack([ia, ib], axis=1).astype(np.int32)))
    return viewports, matching, cams, pts


def test_incremental_sfm_end_to_end():
    viewports, matching, cams_true, pts_true = _make_synthetic_problem()
    incremental = run_incremental_sfm(viewports, matching, SfmOptions())

    # All views should be reconstructed.
    n_valid = sum(1 for vp in viewports if vp.pose.is_valid())
    assert n_valid == len(viewports)

    # Compare camera centers after similarity alignment (gauge freedom).
    centers_est = np.array([vp.pose.fill_camera_pos() for vp in viewports])
    centers_true = np.array([-(R.T @ t) for _, R, t in cams_true])
    R, s, t = _determine_similarity(centers_est, centers_true)
    aligned = (s * (R @ centers_est.T)).T + t
    err = np.linalg.norm(aligned - centers_true, axis=1)
    scene_scale = np.linalg.norm(centers_true.max(0) - centers_true.min(0))
    assert err.max() < 0.02 * scene_scale, f"center errors {err}"

    # Bundle export sanity.
    bundle = incremental.create_bundle()
    assert bundle.get_num_cameras() == len(viewports)
    assert bundle.get_num_features() > 50
    for feat in bundle.features[:10]:
        assert len(feat.refs) >= 2


def test_incremental_sfm_normalize():
    viewports, matching, cams_true, pts_true = _make_synthetic_problem(n_views=4)
    opts = SfmOptions(normalize_scene=True)
    run_incremental_sfm(viewports, matching, opts)
    centers = np.array([vp.pose.fill_camera_pos() for vp in viewports if vp.pose.is_valid()])
    extent = (centers.max(0) - centers.min(0)).max()
    np.testing.assert_allclose(extent, 10.0, rtol=1e-3)
    np.testing.assert_allclose(centers.mean(axis=0), np.zeros(3), atol=1e-5)


def test_prebundle_roundtrip(tmp_path):
    from mve_tpu.sfm.bundler import save_prebundle, load_prebundle

    viewports, matching, _, _ = _make_synthetic_problem(n_views=3)
    p = str(tmp_path / "prebundle.sfm")
    save_prebundle(viewports, matching, p)
    with open(p, "rb") as f:
        assert f.read(14) == b"MVE_PREBUNDLE\n"
    vps, match = load_prebundle(p)
    assert len(vps) == 3
    assert len(match) == len(matching)
    np.testing.assert_allclose(vps[0].positions, viewports[0].positions)
    np.testing.assert_array_equal(match[0].matches, matching[0].matches)


def test_triangulate_new_tracks_groups_and_splits():
    """Pair-exhaustive triangulation (vectorized per view-count group):
    tracks seen in 2..6 views triangulate to their true 3D points, and
    an observation with a corrupted feature position is split off into a
    new track (triangulate.cc best-pair outlier semantics)."""
    import numpy as np

    from mve_tpu.sfm.bundler.common import FeatureReference, Track, Viewport
    from mve_tpu.sfm.bundler.incremental import Incremental
    from mve_tpu.sfm.pose import CameraPose

    rng = np.random.RandomState(2)
    n_views = 6
    # Cameras on an arc looking at the origin-ish volume.
    viewports = []
    poses = []
    for i in range(n_views):
        theta = (i / (n_views - 1) - 0.5) * 1.0
        center = np.array([4.0 * np.sin(theta), 0.1 * i, -4.0 * np.cos(theta)])
        fwd = -center / np.linalg.norm(center)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])
        pose = CameraPose()
        pose.set_k_matrix(0.9, 0.0, 0.0)
        pose.R = R
        pose.t = -R @ center
        poses.append(pose)
        vp = Viewport()
        vp.focal_length = 0.9
        vp.pose = pose
        viewports.append(vp)

    pts = rng.uniform(-0.5, 0.5, (8, 3))
    # Track i observed in views 0..(2 + i % 5): view-count groups 2..6.
    tracks = []
    per_view_positions = [[] for _ in range(n_views)]
    for ti, X in enumerate(pts):
        track = Track()
        nv = 2 + (ti % 5)
        for v in range(nv):
            x = poses[v].R @ X + poses[v].t
            uv = 0.9 * x[:2] / x[2]
            if ti == 4 and v == 1:
                uv = uv + 0.3  # corrupted observation -> outlier
            fid = len(per_view_positions[v])
            per_view_positions[v].append(uv)
            track.features.append(FeatureReference(v, fid))
        tracks.append(track)
    for v, vp in enumerate(viewports):
        vp.positions = np.asarray(per_view_positions[v], np.float32)
        vp.track_ids = np.full(len(vp.positions), -1, np.int32)
    for ti, track in enumerate(tracks):
        for ref in track.features:
            viewports[ref.view_id].track_ids[ref.feature_id] = ti

    inc = Incremental()
    inc.initialize(viewports, tracks)
    inc.triangulate_new_tracks(2)

    n_before = len(pts)
    for ti in range(n_before):
        assert tracks[ti].is_valid(), f"track {ti} not triangulated"
        err = np.linalg.norm(tracks[ti].pos - pts[ti])
        assert err < 1e-3, f"track {ti} error {err}"
    # The corrupted observation was split off track 4 (the 6-view one).
    assert len(inc.tracks) == n_before + 1
    assert len(tracks[4].features) == 5  # lost its outlier view
    split = inc.tracks[-1]
    assert not split.is_valid() and len(split.features) == 1
    assert split.features[0].view_id == 1
