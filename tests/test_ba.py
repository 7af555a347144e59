"""Bundle adjustment tests on synthetic problems (reference analog:
golden-data solver tests in tests/sfm/gtest_ba_*.cc plus an end-to-end
convergence check the reference lacks)."""

import numpy as np

from mve_tpu.sfm.ba import (
    BAProblem, BACamera, BAPoint, BAObservation, BAOptions, BAStatus,
    BundleAdjustment, BundleMode)
from mve_tpu.math.rotation import rodrigues_to_matrix


def _make_problem(ncams=4, npts=60, noise_cam=0.01, noise_pt=0.02, seed=0,
                  noise_obs=0.0):
    """Cameras on an arc looking at a point cloud; observations from true
    params, initial params perturbed."""
    rng = np.random.RandomState(seed)
    pts_true = rng.rand(npts, 3) * 2 - 1
    pts_true[:, 2] += 5.0

    cams_true = []
    for i in range(ncams):
        angle = (i - ncams / 2) * 0.1
        R = np.asarray(rodrigues_to_matrix(np.array([0.0, angle, 0.0])), np.float64)
        t = np.array([-0.5 * i + 0.8, 0.02 * i, 0.1 * i])
        cams_true.append((0.9 + 0.02 * i, R, t))

    observations = []
    for ci, (f, R, t) in enumerate(cams_true):
        pc = (R @ pts_true.T).T + t
        uv = pc[:, :2] / pc[:, 2:]
        uv = uv * f
        uv += rng.randn(npts, 2) * noise_obs
        for pi in range(npts):
            observations.append(BAObservation(uv[pi].copy(), ci, pi))

    cameras = []
    for f, R, t in cams_true:
        dR = np.asarray(rodrigues_to_matrix(rng.randn(3) * noise_cam), np.float64)
        cameras.append(BACamera(
            focal_length=f * (1 + rng.randn() * noise_cam),
            distortion=np.zeros(2),
            translation=t + rng.randn(3) * noise_cam,
            rotation=dR @ R))
    points = [BAPoint(pos=p + rng.randn(3) * noise_pt) for p in pts_true]
    return BAProblem(cameras, points, observations), cams_true, pts_true


def test_ba_full_converges():
    problem, cams_true, pts_true = _make_problem()
    ba = BundleAdjustment(BAOptions(lm_max_iterations=40))
    status = ba.optimize(problem)
    assert status.initial_mse > 1e-5
    assert status.final_mse < 1e-10 or status.final_mse < status.initial_mse * 1e-4
    assert status.num_lm_successful_iterations > 0


def test_ba_noisy_observations():
    problem, _, _ = _make_problem(noise_obs=0.001)
    ba = BundleAdjustment(BAOptions(lm_max_iterations=30))
    status = ba.optimize(problem)
    # Final MSE should approach the observation noise variance (1e-6).
    assert status.final_mse < 4e-6
    assert status.final_mse < status.initial_mse


def test_ba_cameras_only():
    problem, cams_true, pts_true = _make_problem(noise_pt=0.0)
    ba = BundleAdjustment(BAOptions(bundle_mode=BundleMode.CAMERAS, lm_max_iterations=30))
    status = ba.optimize(problem)
    assert status.final_mse < status.initial_mse * 1e-2


def test_ba_points_only():
    problem, cams_true, pts_true = _make_problem(noise_cam=0.0)
    ba = BundleAdjustment(BAOptions(bundle_mode=BundleMode.POINTS, lm_max_iterations=30))
    status = ba.optimize(problem)
    assert status.final_mse < status.initial_mse * 1e-2


def test_ba_fixed_intrinsics():
    problem, cams_true, pts_true = _make_problem()
    f_before = [c.focal_length for c in problem.cameras]
    ba = BundleAdjustment(BAOptions(fixed_intrinsics=True, lm_max_iterations=20))
    status = ba.optimize(problem)
    f_after = [c.focal_length for c in problem.cameras]
    np.testing.assert_allclose(f_before, f_after)
    assert status.final_mse < status.initial_mse


def test_ba_recovers_geometry():
    problem, cams_true, pts_true = _make_problem(noise_cam=0.005, noise_pt=0.01)
    ba = BundleAdjustment(BAOptions(lm_max_iterations=40))
    ba.optimize(problem)
    # Gauge freedom: compare reprojections instead of raw parameters.
    for ci, cam in enumerate(problem.cameras):
        f_true, R_true, t_true = cams_true[ci]
        pc = (cam.rotation @ pts_true.T).T + cam.translation
        uv_est = pc[:, :2] / pc[:, 2:] * cam.focal_length
        pc_t = (R_true @ pts_true.T).T + t_true
        uv_true = pc_t[:, :2] / pc_t[:, 2:] * f_true
        # Estimated cameras project the ORIGINAL points close to truth is
        # not gauge-invariant; instead check that optimized points project
        # to the observations:
        pts_est = np.array([p.pos for p in problem.points])
        pc_e = (cam.rotation @ pts_est.T).T + cam.translation
        uv_e = pc_e[:, :2] / pc_e[:, 2:] * cam.focal_length
        assert np.abs(uv_e - uv_true).max() < 2e-3


def test_ba_float64_precision():
    """BAOptions(dtype=float64) runs the same LM programs in doubles (the
    reference's precision, bundle_adjustment.cc) and reaches an MSE floor
    float32 cannot: with noise-free observations the true parameters are
    an exact optimum, so the limit is arithmetic precision alone."""
    problem32, _, _ = _make_problem(noise_obs=0.0, noise_cam=2e-3,
                                    noise_pt=5e-3, seed=7)
    problem64, _, _ = _make_problem(noise_obs=0.0, noise_cam=2e-3,
                                    noise_pt=5e-3, seed=7)

    ba32 = BundleAdjustment(BAOptions(lm_mse_threshold=0.0,
                                      lm_delta_threshold=1e-12))
    st32 = ba32.optimize(problem32)

    ba64 = BundleAdjustment(BAOptions(dtype=np.float64,
                                      lm_mse_threshold=0.0,
                                      lm_delta_threshold=1e-12))
    st64 = ba64.optimize(problem64)

    assert st64.final_mse < st32.final_mse * 1e-2, (
        f"f64 {st64.final_mse:.3e} should beat f32 {st32.final_mse:.3e}")
    assert st64.final_mse < 1e-14
    # Parameters come back in doubles and are finite.
    assert np.isfinite([c.focal_length for c in problem64.cameras]).all()
