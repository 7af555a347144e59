"""Math layer tests (rotation parameterizations, intersections, camera).

Modeled on the reference's synthetic-data unit tests
(tests/math/gtest_matrix_tools.cc, tests/sfm/gtest_pose.cc style)."""

import numpy as np
import jax.numpy as jnp

from mve_tpu.math.rotation import (
    rodrigues_to_matrix,
    matrix_to_rodrigues,
    quat_to_matrix,
    matrix_to_quat,
    skew,
)
from mve_tpu.math.intersect import ray_box, ray_triangle, point_in_box
from mve_tpu.core.camera import CameraInfo, calibration_matrix, project


def _random_rotations(n, rng):
    q = rng.randn(n, 4)
    return np.asarray(quat_to_matrix(q))


def test_rodrigues_roundtrip():
    rng = np.random.RandomState(0)
    R = _random_rotations(32, rng)
    r = np.asarray(matrix_to_rodrigues(R))
    R2 = np.asarray(rodrigues_to_matrix(r))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_rodrigues_identity_and_small():
    np.testing.assert_allclose(np.asarray(rodrigues_to_matrix(np.zeros(3))), np.eye(3), atol=1e-7)
    r = np.array([1e-9, -1e-9, 1e-9])
    R = np.asarray(rodrigues_to_matrix(r))
    np.testing.assert_allclose(R, np.eye(3) + np.asarray(skew(r)), atol=1e-9)


def test_rodrigues_axis_angle():
    # 90 degrees about z
    r = np.array([0.0, 0.0, np.pi / 2])
    R = np.asarray(rodrigues_to_matrix(r))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_quat_matrix_roundtrip():
    rng = np.random.RandomState(1)
    R = _random_rotations(16, rng)
    q = np.asarray(matrix_to_quat(R))
    R2 = np.asarray(quat_to_matrix(q))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_rotation_orthonormal():
    rng = np.random.RandomState(2)
    r = rng.randn(8, 3)
    R = np.asarray(rodrigues_to_matrix(r))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-6)


def test_ray_box():
    hit, tmin, tmax = ray_box(np.array([0.5, 0.5, -1.0]), np.array([0.0, 0.0, 1.0]),
                              np.zeros(3), np.ones(3))
    assert bool(hit)
    assert abs(float(tmin) - 1.0) < 1e-6
    hit2, _, _ = ray_box(np.array([2.0, 2.0, -1.0]), np.array([0.0, 0.0, 1.0]),
                         np.zeros(3), np.ones(3))
    assert not bool(hit2)


def test_ray_triangle():
    v0, v1, v2 = np.array([0, 0, 0.0]), np.array([1, 0, 0.0]), np.array([0, 1, 0.0])
    hit, t, u, v = ray_triangle(np.array([0.2, 0.2, 1.0]), np.array([0, 0, -1.0]), v0, v1, v2)
    assert bool(hit) and abs(float(t) - 1.0) < 1e-6
    hit2, *_ = ray_triangle(np.array([0.9, 0.9, 1.0]), np.array([0, 0, -1.0]), v0, v1, v2)
    assert not bool(hit2)


def test_point_in_box():
    assert bool(point_in_box(np.array([0.5, 0.5, 0.5]), np.zeros(3), np.ones(3)))
    assert not bool(point_in_box(np.array([1.5, 0.5, 0.5]), np.zeros(3), np.ones(3)))


# ---------------------------------------------------------------------------
# camera
# ---------------------------------------------------------------------------

def test_calibration_landscape_portrait():
    cam = CameraInfo(flen=1.0)
    K = cam.calibration(800, 600)  # landscape: ax = flen*w
    assert abs(K[0, 0] - 800) < 1e-3
    assert abs(K[1, 1] - 800) < 1e-3
    assert abs(K[0, 2] - 400) < 1e-3
    assert abs(K[1, 2] - 300) < 1e-3
    K = cam.calibration(600, 800)  # portrait: ay = flen*h
    assert abs(K[0, 0] - 800) < 1e-3
    assert abs(K[1, 1] - 800) < 1e-3


def test_inverse_calibration():
    cam = CameraInfo(flen=0.9)
    K = cam.calibration(640, 480)
    Ki = cam.inverse_calibration(640, 480)
    np.testing.assert_allclose(K @ Ki, np.eye(3), atol=1e-5)


def test_camera_pose_identities():
    rng = np.random.RandomState(3)
    cam = CameraInfo(flen=1.0)
    cam.rot = _random_rotations(1, rng)[0].astype(np.float32)
    cam.trans = rng.randn(3).astype(np.float32)
    pos = cam.camera_pos()
    # World-to-cam of the camera center is the origin.
    np.testing.assert_allclose(cam.rot @ pos + cam.trans, np.zeros(3), atol=1e-5)
    w2c = cam.world_to_cam()
    c2w = cam.cam_to_world()
    np.testing.assert_allclose(w2c @ c2w, np.eye(4), atol=1e-5)


def test_reprojection_operator():
    """xd = T xs d + t must agree with explicit unproject/reproject."""
    rng = np.random.RandomState(4)
    cam1 = CameraInfo(flen=0.9)
    cam2 = CameraInfo(flen=1.1)
    for cam in (cam1, cam2):
        cam.rot = _random_rotations(1, rng)[0].astype(np.float32)
        cam.trans = rng.randn(3).astype(np.float32) * 0.1
    wh = (640, 480)
    T, t = cam1.reprojection(cam2, wh, wh)
    # Take an image point in view 1 with depth d, unproject, reproject.
    xs = np.array([320.0, 240.0, 1.0], np.float32)
    d = 2.5
    Ki = cam1.inverse_calibration(*wh)
    p_cam1 = Ki @ xs * d
    p_world = cam1.rot.T @ (p_cam1 - cam1.trans)
    p_cam2 = cam2.rot @ p_world + cam2.trans
    expected = cam2.calibration(*wh) @ p_cam2
    expected = expected[:2] / expected[2]
    got = T @ xs * d + t
    got = got[:2] / got[2]
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_project_batched():
    K = calibration_matrix(jnp.array(1.0), jnp.array([0.5, 0.5]), jnp.array(1.0), 100.0, 100.0)
    pts = jnp.array([[0.0, 0.0, 2.0], [0.1, -0.1, 1.0]])
    uv = np.asarray(project(pts, K))
    np.testing.assert_allclose(uv[0], [50, 50], atol=1e-5)
    np.testing.assert_allclose(uv[1], [60, 40], atol=1e-4)
