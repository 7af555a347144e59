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
        "100 200\n"
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
