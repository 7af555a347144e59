"""Robust geometry tests on synthetic camera setups — same strategy as the
reference's tests/sfm/gtest_pose.cc (synthetic scenes built in code)."""

import numpy as np
import jax.numpy as jnp

from mve_tpu.sfm import fundamental as fu
from mve_tpu.sfm import homography as ho
from mve_tpu.sfm import ransac
from mve_tpu.sfm.p3p import pose_p3p, solve_quartic
from mve_tpu.sfm.pose import CameraPose
from mve_tpu.sfm.triangulate import (
    triangulate_match, triangulate_tracks_batched, TriangulateOptions,
    TriangulateStatistics, triangulate_with_checks)
from mve_tpu.math.rotation import rodrigues_to_matrix


def _synthetic_pair(n=50, seed=0, noise=0.0):
    """Two cameras looking at a random point cloud; normalized image coords."""
    rng = np.random.RandomState(seed)
    X = rng.rand(n, 3) * 2 - 1
    X[:, 2] += 4.0
    pose1 = CameraPose()
    pose1.set_k_matrix(1.0, 0.0, 0.0)
    pose1.init_canonical_form()
    pose2 = CameraPose()
    pose2.set_k_matrix(1.0, 0.0, 0.0)
    pose2.R = np.asarray(rodrigues_to_matrix(np.array([0.02, 0.25, 0.01])), np.float64)
    pose2.t = np.array([-0.8, 0.05, 0.1])

    def proj(pose, X):
        p = (pose.fill_p_matrix() @ np.concatenate([X, np.ones((n, 1))], 1).T).T
        return p[:, :2] / p[:, 2:]

    p1 = proj(pose1, X) + rng.randn(n, 2) * noise
    p2 = proj(pose2, X) + rng.randn(n, 2) * noise
    return X, p1, p2, pose1, pose2


def test_eight_point_f():
    X, p1, p2, pose1, pose2 = _synthetic_pair(8)
    F = np.asarray(fu.fundamental_8_point(jnp.asarray(p1, jnp.float32)[None],
                                          jnp.asarray(p2, jnp.float32)[None]))[0]
    # Epipolar constraint x2' F x1 = 0 for all correspondences.
    h1 = np.concatenate([p1, np.ones((8, 1))], 1)
    h2 = np.concatenate([p2, np.ones((8, 1))], 1)
    resid = np.abs(np.einsum("ni,ij,nj->n", h2, F, h1))
    assert resid.max() < 1e-4


def test_f_matches_pose_f():
    X, p1, p2, pose1, pose2 = _synthetic_pair(40)
    res = ransac.ransac_fundamental(p1, p2, ransac.RansacOptions(max_iterations=128))
    F_est = res.model / np.linalg.norm(res.model)
    F_true = fu.fundamental_from_pose(pose1, pose2)
    F_true = F_true / np.linalg.norm(F_true)
    if np.sign(F_est[2, 2]) != np.sign(F_true[2, 2]):
        F_est = -F_est
    assert res.score >= 38
    np.testing.assert_allclose(F_est, F_true, atol=2e-3)


def test_pose_from_essential():
    X, p1, p2, pose1, pose2 = _synthetic_pair(20)
    # K = I so F == E here.
    F = np.asarray(fu.fundamental_8_point(jnp.asarray(p1[:8], jnp.float32)[None],
                                          jnp.asarray(p2[:8], jnp.float32)[None]))[0]
    E = np.asarray(fu.enforce_essential_constraints(jnp.asarray(F)[None]))[0]
    Rs, ts = fu.pose_from_essential(jnp.asarray(E)[None])
    Rs, ts = np.asarray(Rs)[0], np.asarray(ts)[0]
    # One of the four decompositions must match the true relative pose
    # up to scale of t.
    t_true = pose2.t / np.linalg.norm(pose2.t)
    found = False
    for k in range(4):
        if np.allclose(Rs[k], pose2.R, atol=1e-3):
            tk = ts[k] / np.linalg.norm(ts[k])
            if np.allclose(tk, t_true, atol=1e-3):
                found = True
    assert found


def test_sampson_zero_for_perfect():
    X, p1, p2, pose1, pose2 = _synthetic_pair(30)
    F = fu.fundamental_from_pose(pose1, pose2)
    d = np.asarray(fu.sampson_distance(jnp.asarray(F, jnp.float32)[None],
                                       jnp.asarray(p1, jnp.float32)[None],
                                       jnp.asarray(p2, jnp.float32)[None]))[0]
    assert d.max() < 1e-6


def test_triangulate():
    X, p1, p2, pose1, pose2 = _synthetic_pair(25)
    P1 = jnp.asarray(np.tile(pose1.fill_p_matrix(), (25, 1, 1)), jnp.float32)
    P2 = jnp.asarray(np.tile(pose2.fill_p_matrix(), (25, 1, 1)), jnp.float32)
    Xr = np.asarray(triangulate_match(jnp.asarray(p1, jnp.float32),
                                      jnp.asarray(p2, jnp.float32), P1, P2))
    np.testing.assert_allclose(Xr, X, atol=1e-2)


def test_triangulate_tracks_batched_masked():
    X, p1, p2, pose1, pose2 = _synthetic_pair(10)
    pos = np.stack([p1, p2, np.zeros_like(p1)], axis=1)  # (10, 3, 2)
    pm = np.stack(
        [np.tile(pose1.fill_p_matrix(), (10, 1, 1)),
         np.tile(pose2.fill_p_matrix(), (10, 1, 1)),
         np.zeros((10, 3, 4))], axis=1)
    valid = np.tile(np.array([True, True, False]), (10, 1))
    Xr = np.asarray(triangulate_tracks_batched(
        jnp.asarray(pos, jnp.float32), jnp.asarray(pm, jnp.float32), jnp.asarray(valid)))
    np.testing.assert_allclose(Xr, X, atol=1e-2)


def test_triangulate_checks():
    X, p1, p2, pose1, pose2 = _synthetic_pair(5)
    stats = TriangulateStatistics()
    Xr = triangulate_with_checks(
        np.stack([p1[0], p2[0]]), [pose1, pose2], TriangulateOptions(), stats)
    assert Xr is not None and stats.num_new_tracks == 1
    # Behind-camera rejection: flip the point
    pose_flip = CameraPose()
    pose_flip.set_k_matrix(1.0, 0, 0)
    pose_flip.R = np.diag([1.0, -1.0, -1.0])  # looks along -z
    stats2 = TriangulateStatistics()
    r = triangulate_with_checks(np.stack([p1[0], p1[0] + 0.001]),
                                [pose1, pose_flip], TriangulateOptions(), stats2)
    assert r is None


def test_quartic_solver():
    # (x-1)(x-2)(x-3)(x-4) = x^4 -10x^3 +35x^2 -50x +24
    roots, real_mask = solve_quartic(jnp.asarray([-10.0]), jnp.asarray([35.0]),
                                     jnp.asarray([-50.0]), jnp.asarray([24.0]))
    assert np.asarray(real_mask).all()
    got = np.sort(np.asarray(roots)[0])
    np.testing.assert_allclose(got, [1, 2, 3, 4], atol=1e-2)
    # Complex-pair case: x^4 + 1 = 0 has no real roots.
    _, rm2 = solve_quartic(jnp.asarray([0.0]), jnp.asarray([0.0]),
                           jnp.asarray([0.0]), jnp.asarray([1.0]))
    assert not np.asarray(rm2).any()


def test_p3p_recovers_pose():
    rng = np.random.RandomState(3)
    R_true = np.asarray(rodrigues_to_matrix(np.array([0.1, -0.2, 0.15])), np.float64)
    t_true = np.array([0.3, -0.1, 0.5])
    X = rng.rand(3, 3) * 2 - 1
    X[:, 2] += 4
    Xc = (R_true @ X.T).T + t_true
    f = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    Rs, ts, valid = pose_p3p(jnp.asarray(X, jnp.float32)[None], jnp.asarray(f, jnp.float32)[None])
    Rs, ts, valid = np.asarray(Rs)[0], np.asarray(ts)[0], np.asarray(valid)[0]
    best = np.inf
    for k in range(4):
        if not valid[k]:
            continue
        err = np.abs(Rs[k] - R_true).max() + np.abs(ts[k] - t_true).max()
        best = min(best, err)
    assert best < 1e-2


def test_ransac_p3p_with_outliers():
    rng = np.random.RandomState(4)
    n = 60
    R_true = np.asarray(rodrigues_to_matrix(np.array([-0.05, 0.3, 0.02])), np.float64)
    t_true = np.array([0.2, 0.1, 0.4])
    X = rng.rand(n, 3) * 2 - 1
    X[:, 2] += 5
    Xc = (R_true @ X.T).T + t_true
    uv = Xc[:, :2] / Xc[:, 2:]
    # 20% outliers
    out = rng.rand(n) < 0.2
    uv[out] += rng.randn(out.sum(), 2) * 0.2
    res = ransac.ransac_pose_p3p(X, uv, np.eye(3),
                                 ransac.RansacOptions(max_iterations=256, threshold=0.005))
    assert len(res.inliers) >= (~out).sum() - 3
    np.testing.assert_allclose(res.R, R_true, atol=5e-2)
    np.testing.assert_allclose(res.t, t_true, atol=5e-2)


def test_homography_ransac():
    rng = np.random.RandomState(5)
    H_true = np.array([[1.1, 0.02, 0.3], [-0.03, 0.95, -0.2], [0.01, -0.02, 1.0]])
    n = 40
    p1 = rng.rand(n, 2) * 2 - 1
    h = (H_true @ np.concatenate([p1, np.ones((n, 1))], 1).T).T
    p2 = h[:, :2] / h[:, 2:]
    out = rng.rand(n) < 0.25
    p2[out] += rng.randn(out.sum(), 2) * 0.3
    res = ransac.ransac_homography(p1, p2, ransac.RansacOptions(max_iterations=256, threshold=0.01))
    H_est = res.model / res.model[2, 2]
    np.testing.assert_allclose(H_est, H_true / H_true[2, 2], atol=2e-2)
    assert len(res.inliers) >= (~out).sum() - 2
