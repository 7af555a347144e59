"""NVM / COLMAP import and makescene tests."""

import os

import numpy as np

from mve_tpu.core import bundle_io, Scene
from mve_tpu.core.image_io import save_image
from mve_tpu.apps.makescene import import_images, import_bundle


def test_nvm_import(tmp_path):
    nvm = tmp_path / "model.nvm"
    nvm.write_text(
        "NVM_V3\n"
        "\n2\n"
        "img0.jpg 800 1 0 0 0 0.5 0.2 4.0 0 0\n"
        "img1.jpg 800 0.9689124 0 0.2474 -0.4 0.1 4.1 0 0\n"
        "\n1\n"
        "0.1 0.2 3.0 200 100 50 2 0 0 0.1 0.2 1 0 -0.1 0.15\n")
    bundle, meta = bundle_io.load_nvm_bundle(str(nvm))
    assert bundle.get_num_cameras() == 2
    assert bundle.get_num_features() == 1
    assert meta[0]["filename"] == "img0.jpg"
    assert meta[0]["focal_px"] == 800
    # Camera 0: identity rotation at center (0.5, 0.2, 4.0); t = -R c.
    np.testing.assert_allclose(bundle.cameras[0].rot, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(bundle.cameras[0].trans, [-0.5, -0.2, -4.0], atol=1e-4)
    refs = bundle.features[0].refs
    assert [r.view_id for r in refs] == [0, 1]


def test_colmap_import(tmp_path):
    model = tmp_path / "model"
    model.mkdir()
    (model / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500 500 320 240\n")
    (model / "images.txt").write_text(
        "# comment\n"
        "1 1 0 0 0 0.1 0.2 0.3 1 img0.png\n"
        "100 200 7\n"
        "2 0.9689124 0 0.2474 0 0.0 0.1 0.3 1 img1.png\n"
        "\n")
    (model / "points3D.txt").write_text(
        "# comment\n"
        "7 1.0 2.0 3.0 200 150 100 0.5 1 0 2 1\n")
    bundle, meta = bundle_io.load_colmap_bundle(str(model))
    assert bundle.get_num_cameras() == 2
    np.testing.assert_allclose(bundle.cameras[0].flen, 500 / 640, atol=1e-6)
    assert bundle.get_num_features() == 1
    assert len(bundle.features[0].refs) == 2
    np.testing.assert_allclose(bundle.features[0].refs[0].pos, [100, 200])


def test_makescene_images(tmp_path):
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    for i in range(3):
        save_image((np.random.rand(20, 30, 3) * 255).astype(np.uint8),
                   str(imgdir / f"im{i}.png"))
    scene_path = str(tmp_path / "scene")
    n = import_images(str(imgdir), scene_path)
    assert n == 3
    scene = Scene(scene_path)
    assert len(scene.get_views()) == 3
    v = scene.get_view_by_id(0)
    assert v.has_image("original")
    assert v.get_image("original").shape == (20, 30, 3)


def test_makescene_max_pixels(tmp_path):
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    save_image((np.random.rand(64, 64, 3) * 255).astype(np.uint8),
               str(imgdir / "big.png"))
    scene_path = str(tmp_path / "scene")
    import_images(str(imgdir), scene_path, max_pixels=1500)
    scene = Scene(scene_path)
    img = scene.get_view_by_id(0).get_image("original")
    assert img.shape[0] * img.shape[1] <= 1500


def _write_colmap_bin_model(model, with_depth=False):
    """Write a tiny binary COLMAP model (cameras/images/points3D.bin)."""
    import struct

    model.mkdir(parents=True, exist_ok=True)
    with open(model / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Ii", 1, 1))  # id 1, PINHOLE
        f.write(struct.pack("<QQ", 640, 480))
        f.write(struct.pack("<4d", 500.0, 500.0, 320.0, 240.0))
    with open(model / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<I", 1))
        f.write(struct.pack("<7d", 1, 0, 0, 0, 0.1, 0.2, 0.3))
        f.write(struct.pack("<I", 1))
        f.write(b"img0.png\x00")
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ddQ", 100.0, 200.0, 7))
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<7d", 0.9689124, 0, 0.2474, 0, 0.0, 0.1, 0.3))
        f.write(struct.pack("<I", 1))
        f.write(b"img1.png\x00")
        f.write(struct.pack("<Q", 0))
    with open(model / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 7))
        f.write(struct.pack("<3d", 1.0, 2.0, 3.0))
        f.write(struct.pack("<3B", 200, 150, 100))
        f.write(struct.pack("<d", 0.5))
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<II", 1, 0))
        f.write(struct.pack("<II", 2, 1))


def test_colmap_binary_import(tmp_path):
    model = tmp_path / "model"
    _write_colmap_bin_model(model)
    bundle, meta = bundle_io.load_colmap_bundle(str(model))
    assert bundle.get_num_cameras() == 2
    np.testing.assert_allclose(bundle.cameras[0].flen, 500 / 640, atol=1e-6)
    np.testing.assert_allclose(bundle.cameras[0].rot, np.eye(3), atol=1e-6)
    assert bundle.get_num_features() == 1
    assert len(bundle.features[0].refs) == 2
    np.testing.assert_allclose(bundle.features[0].refs[0].pos, [100, 200])
    assert meta[0]["filename"] == "img0.png"


def test_colmap_workspace_with_depth(tmp_path):
    ws = tmp_path / "workspace"
    _write_colmap_bin_model(ws / "sparse" / "0")
    (ws / "images").mkdir()
    for name in ("img0.png", "img1.png"):
        save_image((np.random.rand(480, 640, 3) * 255).astype(np.uint8),
                   str(ws / "images" / name))
    dm_dir = ws / "stereo" / "depth_maps"
    dm_dir.mkdir(parents=True)
    depth = np.full((480, 640), 2.5, np.float32)
    with open(dm_dir / "img0.png.geometric.bin", "wb") as f:
        f.write(b"640&480&1&")
        f.write(depth.tobytes())
    bundle, meta = bundle_io.load_colmap_bundle(str(ws))
    assert meta[0]["depth_map"] is not None
    assert meta[1]["depth_map"] is None

    from mve_tpu.apps.makescene import import_bundle
    scene_path = str(tmp_path / "scene")
    import_bundle(str(ws), scene_path, fmt="colmap", scale=1)
    scene = Scene(scene_path)
    view = scene.views[0]
    d = view.get_image("depth-L1")
    assert d.shape[:2] == (240, 320)
    # MVE convention is ray length: >= z-depth everywhere, equal on axis.
    assert float(np.nanmin(np.asarray(d))) >= 2.5 - 1e-4
    cy, cx = 240 * 240 // 480, 320 * 320 // 640
    np.testing.assert_allclose(np.ravel(d[cy, cx])[0], 2.5, rtol=1e-3)
    assert view.has_image("undist-L1")


def test_makescene_append_and_intrinsics(tmp_path):
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    for i in range(2):
        save_image((np.random.rand(20, 30, 3) * 255).astype(np.uint8),
                   str(imgdir / f"im{i}.png"))
    scene_path = str(tmp_path / "scene")
    import_images(str(imgdir), scene_path, init_intrinsics="0.92,0.01,-0.02")
    scene = Scene(scene_path)
    assert len([v for v in scene.views if v is not None]) == 2
    cam = scene.views[0].camera
    np.testing.assert_allclose(cam.flen, 0.92, atol=1e-6)
    np.testing.assert_allclose(cam.dist, [0.01, -0.02], atol=1e-6)
    assert scene.views[0].has_image("thumbnail")

    n = import_images(str(imgdir), scene_path, append=True)
    assert n == 2
    scene = Scene(scene_path)
    ids = sorted(v.id for v in scene.views if v is not None)
    assert ids == [0, 1, 2, 3]
