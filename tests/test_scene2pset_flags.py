"""scene2pset flag-level tests: scale property, poisson normals, AABB
filter, min-fill skipping (reference: apps/scene2pset/scene2pset.cc:32-48
settings, :121 poisson mode, :345-358 scale)."""

import numpy as np

from mve_tpu.core import Scene, mesh_io
from mve_tpu.core.view import View
from mve_tpu.core.camera import CameraInfo
from mve_tpu.apps.scene2pset import scene_to_pointset


def _make_depth_scene(path, w=12, h=10, depth_z=3.0):
    """One identity-pose view with a constant-z plane depth map
    (ray-length convention, depthmap.h:60-64)."""
    scene = Scene.create(path)
    cam = CameraInfo()
    cam.flen = 1.0
    view = View.create(scene.view_dir_for_id(0), 0)
    view.set_camera(cam)
    invproj = cam.inverse_calibration(w, h)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1) @ invproj.T
    ray = depth_z * np.linalg.norm(pix, axis=-1) / pix[..., 2]
    view.set_image("depth-L0", ray.astype(np.float32))
    view.set_image("undistorted",
                   np.full((h, w, 3), 128, np.uint8))
    view.save_view()
    scene.add_view(view)
    return w, h


def test_scene2pset_scale_and_conf(tmp_path):
    path = str(tmp_path / "scene")
    w, h = _make_depth_scene(path)
    out = str(tmp_path / "pset.ply")
    pset = scene_to_pointset(path, out, with_normals=True, with_scale=True,
                             with_conf=True, scale_factor=2.5, verbose=False)
    assert pset.num_vertices() == w * h
    assert pset.num_faces() == 0
    np.testing.assert_allclose(pset.vertices[:, 2], 3.0, rtol=1e-5)
    # Scale = mean adjacent edge length x 2.5; the pixel footprint at
    # z=3 with flen=1 and larger dim 12 is 3/12 = 0.25 world units.
    assert pset.has_vertex_values()
    interior = pset.vertex_values[pset.vertex_confidences > 0]
    assert np.all(interior > 0.25 * 2.5 * 0.7)
    assert np.all(interior < 0.25 * 2.5 * 2.5)
    # Normals face the camera (-z or +z consistently, unit length).
    assert pset.has_vertex_normals()
    norms = np.linalg.norm(pset.vertex_normals, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert np.all(np.abs(pset.vertex_normals[:, 2]) > 0.9)
    # Round-trip through the PLY on disk.
    back = mesh_io.load_mesh(out)
    assert back.num_vertices() == w * h
    assert back.has_vertex_values() and back.has_vertex_confidences()


def test_scene2pset_poisson_normals(tmp_path):
    path = str(tmp_path / "scene")
    _make_depth_scene(path)
    pset = scene_to_pointset(path, poisson_normals=True, with_conf=True,
                             verbose=False)
    # Poisson mode scales normals by confidence: boundary normals are
    # zeroed, interior keep magnitude.
    norms = np.linalg.norm(pset.vertex_normals, axis=1)
    assert norms.min() == 0.0
    assert norms.max() > 0.5


def test_scene2pset_aabb_filter(tmp_path):
    path = str(tmp_path / "scene")
    w, h = _make_depth_scene(path)
    full = scene_to_pointset(path, verbose=False)
    half = scene_to_pointset(
        path, aabb=(np.array([0.0, -10.0, -10.0]), np.array([10.0, 10.0, 10.0])),
        verbose=False)
    assert 0 < half.num_vertices() < full.num_vertices()
    assert np.all(half.vertices[:, 0] >= 0.0)


def test_scene2pset_min_fill_skips(tmp_path):
    path = str(tmp_path / "scene")
    _make_depth_scene(path)
    # Zero out most of the depth map => fill fraction below threshold.
    scene = Scene(path)
    view = scene.get_views()[0]
    dm = np.squeeze(view.get_float_image("depth-L0")).copy()
    dm[2:, :] = 0.0
    view.set_image("depth-L0", dm)
    view.save_view()
    pset = scene_to_pointset(path, min_valid_fraction=0.5, verbose=False)
    assert pset.num_vertices() == 0
