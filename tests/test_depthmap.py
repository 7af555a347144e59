"""Depth-map utility tests (reference analog: depthmap behaviors from
libs/mve/depthmap.cc exercised with synthetic maps)."""

import numpy as np

from mve_tpu.core import depthmap as dm
from mve_tpu.core.camera import CameraInfo


def _invproj(w=16, h=12, flen=1.0):
    cam = CameraInfo(flen=flen)
    return cam.inverse_calibration(w, h)


def test_convention_roundtrip():
    rng = np.random.RandomState(0)
    z = rng.rand(12, 16) * 4 + 1
    invproj = _invproj()
    ray = dm.depthmap_convert_conventions(z, invproj, to_mve=True)
    z2 = dm.depthmap_convert_conventions(ray, invproj, to_mve=False)
    np.testing.assert_allclose(z2, z, rtol=1e-5)
    # Ray lengths are >= z depths.
    assert (ray >= z - 1e-6).all()


def test_cleanup_islands():
    depth = np.zeros((10, 10), np.float32)
    depth[1:8, 1:8] = 2.0       # big region: 49 px
    depth[0, 9] = 2.0           # isolated pixel
    out = dm.depthmap_cleanup(depth, thres=5)
    assert out[0, 9] == 0.0
    assert (out[1:8, 1:8] > 0).all()


def test_confidence_clean():
    depth = np.full((4, 4), 2.0, np.float32)
    conf = np.zeros((4, 4), np.float32)
    conf[0, 0] = 1.0
    out = dm.depthmap_confidence_clean(depth, conf, 0.5)
    assert out[0, 0] == 2.0
    assert (out.reshape(-1)[1:] == 0).all()


def test_bilateral_preserves_edges():
    depth = np.full((12, 12), 2.0, np.float32)
    depth[:, 6:] = 4.0
    out = dm.depthmap_bilateral_filter(depth, gc_sigma=2.0, pc_factor=0.01)
    # Smooth regions unchanged, edge not blurred across.
    np.testing.assert_allclose(out[:, :5], 2.0, atol=1e-3)
    np.testing.assert_allclose(out[:, 7:], 4.0, atol=1e-3)


def test_triangulate_plane():
    """A constant-z plane viewed fronto-parallel: full connectivity and
    correct 3D positions."""
    w, h = 10, 8
    invproj = _invproj(w, h)
    # Build ray-length map of plane z=3.
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1) @ invproj.T
    ray = 3.0 * np.linalg.norm(pix, axis=-1) / pix[..., 2]
    mesh, vid = dm.depthmap_triangulate(ray, invproj, dd_factor=5.0)
    assert mesh.num_vertices() == w * h
    assert mesh.num_faces() == (w - 1) * (h - 1) * 2
    np.testing.assert_allclose(mesh.vertices[:, 2], 3.0, rtol=1e-5)


def test_triangulate_discontinuity():
    """A big depth jump drops connecting triangles (dd_factor test)."""
    w, h = 10, 8
    invproj = _invproj(w, h)
    depth = np.full((h, w), 2.0)
    depth[:, 5:] = 40.0
    mesh, _ = dm.depthmap_triangulate(depth, invproj, dd_factor=5.0)
    # Two disconnected sheets: fewer faces than full connectivity.
    assert mesh.num_faces() < (w - 1) * (h - 1) * 2
    from mve_tpu.core.mesh_tools import mesh_components

    labels = mesh_components(mesh)
    assert len(np.unique(labels)) >= 2


def test_mesh_confidences_ramp():
    # 6x6 grid sheet: boundary conf 0, interior rises.
    w = h = 6
    invproj = _invproj(w, h)
    depth = np.full((h, w), 2.0)
    mesh, _ = dm.depthmap_triangulate(depth, invproj, dd_factor=0.0)
    dm.depthmap_mesh_confidences(mesh, iterations=3)
    assert mesh.vertex_confidences.min() == 0.0
    assert mesh.vertex_confidences.max() > 0.5
