"""Tests for the small CLI apps: bundle2pset, mesh2pset, meshconvert,
prebundle (reference: apps/bundle2pset/bundle2pset.cc,
apps/mesh2pset/mesh2pset.cc, apps/meshconvert/meshconvert.cc,
apps/prebundle/prebundle.cc)."""

import os

import numpy as np

from mve_tpu.core import bundle_io, mesh_io
from mve_tpu.core.bundle import Bundle, Feature2D, Feature3D
from mve_tpu.core.camera import CameraInfo
from mve_tpu.core.mesh import TriangleMesh
from mve_tpu.sfm.bundler.common import (Viewport, TwoViewMatching,
                                        save_prebundle)
from mve_tpu.apps.bundle2pset import bundle_to_pointset, main as b2p_main
from mve_tpu.apps.mesh2pset import mesh_to_pset
from mve_tpu.apps.meshconvert import main as meshconvert_main
from mve_tpu.apps.prebundle import main as prebundle_main


def _make_bundle(n_cams=3, n_feats=10, seed=0):
    rng = np.random.RandomState(seed)
    bundle = Bundle()
    for i in range(n_cams):
        cam = CameraInfo()
        cam.flen = 0.9
        cam.trans = rng.randn(3).astype(np.float32)
        bundle.cameras.append(cam)
    for j in range(n_feats):
        f = Feature3D(pos=rng.randn(3).astype(np.float32),
                      color=rng.rand(3).astype(np.float32))
        f.refs = [Feature2D(view_id=j % n_cams, feature_id=j,
                            pos=rng.rand(2).astype(np.float32))]
        bundle.features.append(f)
    return bundle


def test_bundle2pset(tmp_path):
    bundle = _make_bundle()
    bpath = str(tmp_path / "synth_0.out")
    bundle_io.save_mve_bundle(bundle, bpath)

    out = str(tmp_path / "pset.ply")
    mesh = bundle_to_pointset(bpath, out)
    assert mesh.num_vertices() == 10 and os.path.isfile(out)
    back = mesh_io.load_mesh(out)
    assert np.allclose(back.vertices, bundle.feature_positions(), atol=1e-6)
    assert np.allclose(back.vertex_colors[:, :3], bundle.feature_colors(),
                       atol=1.0 / 255)
    # CLI entry point over the same file.
    out2 = str(tmp_path / "pset2.ply")
    assert b2p_main([bpath, out2]) == 0 and os.path.isfile(out2)


def test_mesh2pset_scale_from_edges(tmp_path):
    # Unit right-triangle pair: adjacent edge lengths are known.
    mesh = TriangleMesh()
    mesh.vertices = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                             np.float32)
    mesh.faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    mpath = str(tmp_path / "mesh.ply")
    mesh_io.save_mesh(mesh, mpath)

    out = str(tmp_path / "pset.ply")
    pset = mesh_to_pset(mpath, out, scale_factor=2.0, no_confidences=True)
    assert pset.num_faces() == 0
    assert pset.num_vertices() == 4
    assert pset.has_vertex_normals()
    # Vertex 0 touches edges (0,1) len 1 and (2,0) len 1 => mean 1, x2.
    assert abs(pset.vertex_values[0] - 2.0) < 1e-5
    back = mesh_io.load_mesh(out)
    assert back.has_vertex_values() and back.has_vertex_normals()
    assert np.allclose(back.vertex_values, pset.vertex_values, atol=1e-6)

    # no_scale mode omits values.
    pset2 = mesh_to_pset(mpath, str(tmp_path / "p2.ply"), no_scale=True,
                          no_confidences=True)
    assert not pset2.has_vertex_values()


def test_meshconvert_roundtrip(tmp_path):
    mesh = TriangleMesh()
    mesh.vertices = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    mesh.faces = np.array([[0, 1, 2]], np.int32)
    src = str(tmp_path / "mesh.ply")
    mesh_io.save_mesh(mesh, src)

    for ext in ("off", "obj"):
        dst = str(tmp_path / f"mesh.{ext}")
        assert meshconvert_main([src, dst]) == 0
        back = mesh_io.load_mesh(dst)
        assert back.num_vertices() == 3 and back.num_faces() == 1
        assert np.allclose(back.vertices, mesh.vertices, atol=1e-5)

    # ASCII PLY flag produces a text header readable back.
    dst = str(tmp_path / "mesh_ascii.ply")
    assert meshconvert_main([src, dst, "--ascii"]) == 0
    with open(dst, "rb") as f:
        head = f.read(64)
    assert b"format ascii" in head
    back = mesh_io.load_mesh(dst)
    assert back.num_vertices() == 3 and back.num_faces() == 1


def test_prebundle_stats(tmp_path, capsys):
    rng = np.random.RandomState(1)
    viewports = []
    for _ in range(3):
        vp = Viewport()
        vp.positions = rng.rand(5, 2).astype(np.float32)
        vp.colors = (rng.rand(5, 3) * 255).astype(np.uint8)
        viewports.append(vp)
    matching = [TwoViewMatching(0, 1, np.array([[0, 1], [2, 3]], np.int32)),
                TwoViewMatching(1, 2, np.array([[4, 0]], np.int32))]
    path = str(tmp_path / "prebundle.sfm")
    save_prebundle(viewports, matching, path)

    assert prebundle_main([path]) == 0
    out = capsys.readouterr().out
    assert "Viewports: 3" in out
    assert "total 15" in out
    assert "Matched pairs: 2" in out
    assert "pair (0, 1): 2 matches" in out
