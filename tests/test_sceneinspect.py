"""sceneinspect (headless UMVE equivalent) tests."""

import io
import os

import numpy as np

from mve_tpu.apps import sceneinspect
from mve_tpu.core import Scene
from mve_tpu.core.mesh_io import load_mesh

from tests.synthetic import make_plane_scene, expected_ray_depth


def _scene_with_depth(path):
    make_plane_scene(str(path), n_views=3)
    scene = Scene(str(path))
    for v in scene.get_views():
        if v is None:
            continue
        img = v.get_image("undistorted")
        h, w = np.asarray(img).shape[:2]
        depth = expected_ray_depth(v.camera, w, h)
        v.set_image("depth-L0", np.asarray(depth, np.float32))
        v.save_view()
    return scene


def test_info_and_report(tmp_path):
    _scene_with_depth(tmp_path / "scene")
    out = io.StringIO()
    info = sceneinspect.scene_info(str(tmp_path / "scene"), out=out)
    assert len(info["views"]) == 3
    assert info["bundle"]["cameras"] == 3
    assert "depth-L0" in info["views"][0]["images"]
    assert "view    0" in out.getvalue()

    report = tmp_path / "report.html"
    sceneinspect.write_report(str(tmp_path / "scene"), str(report))
    html = report.read_text()
    assert "data:image/png;base64," in html
    assert "const PTS" in html and "FRUSTA" in html


def test_export_tonemap(tmp_path):
    _scene_with_depth(tmp_path / "scene")
    png = tmp_path / "depth.png"
    sceneinspect.export_embedding(str(tmp_path / "scene"), 0, "depth-L0",
                                  str(png), mode="depth")
    from mve_tpu.core.image_io import load_image
    img = load_image(str(png))
    assert img.dtype == np.uint8
    assert img.max() > 0


def test_frusta_points_dmtriangulate(tmp_path):
    _scene_with_depth(tmp_path / "scene")
    sp = str(tmp_path / "scene")

    frusta = sceneinspect.frusta_mesh(sp)
    assert frusta.num_vertices() == 3 * 5
    assert frusta.num_faces() == 3 * 6

    pts = sceneinspect.sfm_points_mesh(sp)
    assert pts.num_vertices() > 0

    mesh = sceneinspect.dm_triangulate(sp, 0, "depth-L0",
                                       image_name="undistorted")
    assert mesh.num_faces() > 0
    # The synthetic depth is the z=5 plane; world-space vertices must lie on it.
    np.testing.assert_allclose(mesh.vertices[:, 2], 5.0, atol=5e-2)


def test_delete_embeddings(tmp_path):
    _scene_with_depth(tmp_path / "scene")
    sp = str(tmp_path / "scene")
    n = sceneinspect.delete_embeddings(sp, "depth-L0", view_ids=[0, 1])
    assert n == 2
    scene = Scene(sp)
    assert not scene.get_view_by_id(0).has_image("depth-L0")
    assert scene.get_view_by_id(2).has_image("depth-L0")


def test_cli_roundtrip(tmp_path):
    _scene_with_depth(tmp_path / "scene")
    sp = str(tmp_path / "scene")
    ply = str(tmp_path / "frusta.ply")
    assert sceneinspect.main(["frusta", sp, ply]) == 0
    mesh = load_mesh(ply)
    assert mesh.num_vertices() == 15
