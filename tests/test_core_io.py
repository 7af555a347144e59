"""Stage-0 data plane tests: image I/O, view/scene round trips, bundle I/O,
mesh I/O. Modeled on the reference's filesystem-fixture test style
(tests/mve/gtest_scene.cc, gtest_image_io.cc, gtest_mesh_io.cc)."""

import os

import numpy as np
import pytest

from mve_tpu.core import image_io, mesh_io, bundle_io
from mve_tpu.core import CameraInfo, Scene, TriangleMesh, View
from mve_tpu.core.bundle import Bundle, Feature2D, Feature3D
from mve_tpu.utils.ini import parse_ini_file, save_ini_file


# ---------------------------------------------------------------------------
# image io
# ---------------------------------------------------------------------------

def test_mvei_roundtrip(tmp_path):
    for dtype in (np.uint8, np.uint16, np.float32, np.float64, np.int32):
        img = (np.random.rand(13, 17, 3) * 100).astype(dtype)
        p = str(tmp_path / f"img_{np.dtype(dtype).name}.mvei")
        image_io.save_mvei(img, p)
        out = image_io.load_mvei(p)
        assert out.dtype == img.dtype
        np.testing.assert_array_equal(out, img)
    w, h, c, dt = image_io.load_mvei_headers(p)
    assert (w, h, c) == (17, 13, 3)


def test_mvei_signature(tmp_path):
    p = str(tmp_path / "x.mvei")
    image_io.save_mvei(np.zeros((2, 2, 1), np.uint8), p)
    with open(p, "rb") as f:
        assert f.read(11) == b"\x89MVE_IMAGE\n"


def test_pfm_roundtrip(tmp_path):
    img = np.random.rand(9, 7, 1).astype(np.float32)
    p = str(tmp_path / "img.pfm")
    image_io.save_pfm(img, p)
    np.testing.assert_allclose(image_io.load_pfm(p), img)
    img3 = np.random.rand(5, 6, 3).astype(np.float32)
    image_io.save_pfm(img3, p)
    np.testing.assert_allclose(image_io.load_pfm(p), img3)


def test_ppm_roundtrip(tmp_path):
    img8 = (np.random.rand(6, 5, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.ppm")
    image_io.save_ppm(img8, p)
    np.testing.assert_array_equal(image_io.load_ppm(p), img8)
    img16 = (np.random.rand(6, 5, 1) * 65535).astype(np.uint16)
    p2 = str(tmp_path / "img.pgm")
    image_io.save_ppm(img16, p2)
    np.testing.assert_array_equal(image_io.load_ppm(p2), img16)


def test_png_roundtrip(tmp_path):
    img = (np.random.rand(8, 8, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    image_io.save_image(img, p)
    np.testing.assert_array_equal(image_io.load_image(p), img)


# ---------------------------------------------------------------------------
# ini
# ---------------------------------------------------------------------------

def test_ini_roundtrip(tmp_path):
    data = {"view.id": "7", "view.name": "IMG_001", "camera.focal_length": "0.86"}
    p = str(tmp_path / "meta.ini")
    save_ini_file(data, p)
    assert parse_ini_file(p) == data


# ---------------------------------------------------------------------------
# view / scene
# ---------------------------------------------------------------------------

def test_view_roundtrip(tmp_path):
    vdir = str(tmp_path / "view_0000.mve")
    view = View.create(vdir, 0, "testview")
    cam = CameraInfo(flen=0.92, trans=np.array([1, 2, 3], np.float32))
    view.set_camera(cam)
    img = (np.random.rand(10, 12, 3) * 255).astype(np.uint8)
    view.set_image("undistorted", img)
    depth = np.random.rand(10, 12, 1).astype(np.float32)
    view.set_image("depth-L0", depth)
    view.set_blob("exif", b"fake-exif-data")
    assert view.is_dirty()
    view.save_view(vdir)
    assert not view.is_dirty()

    v2 = View(vdir)
    assert v2.id == 0
    assert v2.name == "testview"
    assert abs(v2.camera.flen - 0.92) < 1e-6
    np.testing.assert_allclose(v2.camera.trans, [1, 2, 3])
    np.testing.assert_array_equal(v2.get_image("undistorted"), img)
    np.testing.assert_allclose(v2.get_image("depth-L0"), depth)
    assert v2.get_blob("exif") == b"fake-exif-data"
    assert v2.get_image_size("undistorted") == (12, 10)
    # float image saved as MVEI, byte image as PNG (view.cc:846 policy)
    files = os.listdir(vdir)
    assert "undistorted.png" in files
    assert "depth-L0.mvei" in files


def test_view_original_immutable(tmp_path):
    view = View.create(str(tmp_path / "v.mve"), 0)
    with pytest.raises(ValueError):
        view.set_image("original", np.zeros((2, 2, 3), np.uint8))


def test_scene_roundtrip(tmp_path):
    spath = str(tmp_path / "scene")
    scene = Scene.create(spath)
    for i in range(3):
        view = View.create(scene.view_dir_for_id(i), i)
        view.set_camera(CameraInfo(flen=1.0))
        view.set_image("undistorted", np.full((4, 4, 3), i, np.uint8))
        scene.add_view(view)
    scene.save_views()

    s2 = Scene(spath)
    assert len(s2.get_views()) == 3
    assert s2.get_view_by_id(1).id == 1
    np.testing.assert_array_equal(
        s2.get_view_by_id(2).get_image("undistorted"), np.full((4, 4, 3), 2, np.uint8)
    )
    assert s2.cache_cleanup() == 1


# ---------------------------------------------------------------------------
# bundle io
# ---------------------------------------------------------------------------

def _make_bundle(ncams=3, nfeats=5):
    b = Bundle()
    rng = np.random.RandomState(42)
    for i in range(ncams):
        cam = CameraInfo(flen=0.8 + 0.1 * i)
        cam.trans = rng.randn(3).astype(np.float32)
        # proper rotation
        q = rng.randn(4)
        from mve_tpu.math.rotation import quat_to_matrix

        cam.rot = np.asarray(quat_to_matrix(q)).astype(np.float32)
        b.cameras.append(cam)
    for j in range(nfeats):
        refs = [Feature2D(i, j) for i in range(ncams)]
        b.features.append(
            Feature3D(rng.randn(3).astype(np.float32), rng.rand(3).astype(np.float32), refs)
        )
    return b


def test_bundle_roundtrip(tmp_path):
    b = _make_bundle()
    p = str(tmp_path / "synth_0.out")
    bundle_io.save_mve_bundle(b, p)
    with open(p) as f:
        assert f.readline().strip() == "drews 1.0"
    b2 = bundle_io.load_mve_bundle(p)
    assert b2.get_num_cameras() == 3
    assert b2.get_num_features() == 5
    np.testing.assert_allclose(b2.cameras[1].rot, b.cameras[1].rot, atol=1e-6)
    np.testing.assert_allclose(b2.feature_positions(), b.feature_positions(), atol=1e-6)
    assert [r.view_id for r in b2.features[0].refs] == [0, 1, 2]


def test_bundle_invalid_camera(tmp_path):
    b = _make_bundle(2, 1)
    b.cameras[0].flen = 0.0
    p = str(tmp_path / "synth_0.out")
    bundle_io.save_mve_bundle(b, p)
    b2 = bundle_io.load_mve_bundle(p)
    assert b2.cameras[0].flen == 0.0
    assert b2.cameras[1].flen > 0.0


def test_scene_bundle(tmp_path):
    spath = str(tmp_path / "scene")
    scene = Scene.create(spath)
    scene.set_bundle(_make_bundle())
    scene.save_scene()
    s2 = Scene(spath)
    assert s2.has_bundle()
    assert s2.get_bundle().get_num_cameras() == 3


# ---------------------------------------------------------------------------
# mesh io
# ---------------------------------------------------------------------------

def _make_mesh():
    mesh = TriangleMesh()
    mesh.vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    mesh.faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh.vertex_colors = np.tile(np.array([[1, 0.5, 0.25, 1]], np.float32), (4, 1))
    mesh.vertex_confidences = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    mesh.vertex_values = np.array([1, 2, 3, 4], np.float32)
    return mesh


def test_ply_binary_roundtrip(tmp_path):
    mesh = _make_mesh()
    mesh.recalc_normals()
    p = str(tmp_path / "mesh.ply")
    mesh_io.save_ply_mesh(mesh, p)
    m2 = mesh_io.load_ply_mesh(p)
    np.testing.assert_allclose(m2.vertices, mesh.vertices)
    np.testing.assert_array_equal(m2.faces, mesh.faces)
    np.testing.assert_allclose(m2.vertex_confidences, mesh.vertex_confidences)
    np.testing.assert_allclose(m2.vertex_values, mesh.vertex_values)
    np.testing.assert_allclose(m2.vertex_normals, mesh.vertex_normals, atol=1e-6)
    np.testing.assert_allclose(m2.vertex_colors[:, :3], mesh.vertex_colors[:, :3], atol=1 / 255.0)


def test_ply_ascii_roundtrip(tmp_path):
    mesh = _make_mesh()
    p = str(tmp_path / "mesh.ply")
    mesh_io.save_ply_mesh(mesh, p, fmt="ascii")
    m2 = mesh_io.load_ply_mesh(p)
    np.testing.assert_allclose(m2.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(m2.faces, mesh.faces)


def test_off_obj_npts_roundtrip(tmp_path):
    mesh = _make_mesh()
    for ext in ("off", "obj"):
        p = str(tmp_path / f"mesh.{ext}")
        mesh_io.save_mesh(mesh, p)
        m2 = mesh_io.load_mesh(p)
        np.testing.assert_allclose(m2.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(m2.faces, mesh.faces)
    p = str(tmp_path / "mesh.npts")
    mesh_io.save_mesh(mesh, p)
    m2 = mesh_io.load_mesh(p)
    np.testing.assert_allclose(m2.vertices, mesh.vertices, atol=1e-5)
    assert m2.has_vertex_normals()


# ---------------------------------------------------------------------------
# mesh algorithms
# ---------------------------------------------------------------------------

def test_recalc_normals():
    mesh = _make_mesh()
    mesh.recalc_normals()
    np.testing.assert_allclose(mesh.face_normals, [[0, 0, 1], [0, 0, 1]], atol=1e-6)
    np.testing.assert_allclose(mesh.vertex_normals, np.tile([[0, 0, 1]], (4, 1)), atol=1e-6)


def test_delete_vertices_fix_faces():
    mesh = _make_mesh()
    mask = np.array([False, True, False, False])
    mesh.delete_vertices_fix_faces(mask)
    assert mesh.num_vertices() == 3
    assert mesh.num_faces() == 1
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])
    np.testing.assert_allclose(mesh.vertex_confidences, [0.1, 0.3, 0.4])


def test_mesh_info_classification():
    from mve_tpu.core.mesh import MeshInfo

    mesh = _make_mesh()
    info = MeshInfo(mesh)
    # All four quad corners are border vertices.
    assert all(info.vclass[v] == MeshInfo.BORDER for v in range(4))
    # Closed tetrahedron: all simple.
    tet = TriangleMesh()
    tet.vertices = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tet.faces = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]], np.int32)
    info = MeshInfo(tet)
    assert all(info.vclass[v] == MeshInfo.SIMPLE for v in range(4))
