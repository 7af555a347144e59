"""Full pipeline end-to-end: rendered images -> sfmrecon -> dmrecon ->
scene2pset -> fssrecon -> meshclean — the integration test the reference
lacks (SURVEY.md §4). Exercises real SIFT, matching, RANSAC, incremental
SfM + BA, MVS, fusion and FSSR through the app-level entry points."""

import os

import numpy as np
import pytest

from mve_tpu.core import Scene
from mve_tpu.apps.sfmrecon import sfm_reconstruct
from mve_tpu.apps.dmrecon import reconstruct_views
from mve_tpu.apps.scene2pset import scene_to_pointset
from mve_tpu.apps.fssrecon import fssr_reconstruct
from mve_tpu.apps.meshclean import mesh_clean
from mve_tpu.mvs import Settings
from mve_tpu.sfm.bundler.incremental import _determine_similarity

from tests.synthetic import make_two_plane_scene


@pytest.fixture(scope="module")
def e2e_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("e2e"))


@pytest.fixture(scope="module")
def reconstructed_scene(e2e_dir):
    scene_path = os.path.join(e2e_dir, "scene")
    _, cams_true = make_two_plane_scene(scene_path, n_views=6)
    incremental = sfm_reconstruct(scene_path, intrinsics_from_views=False,
                                  verbose=True)
    return scene_path, cams_true, incremental


def test_sfm_stage(reconstructed_scene):
    scene_path, cams_true, _ = reconstructed_scene
    scene = Scene(scene_path)
    bundle = scene.get_bundle()
    assert bundle.get_num_cameras() == 6
    valid = [c for c in bundle.cameras if c.flen > 0]
    assert len(valid) == 6, f"only {len(valid)} cameras reconstructed"
    assert bundle.get_num_features() > 100

    # Camera centers vs ground truth (similarity-aligned).
    est = np.array([c.camera_pos() for c in bundle.cameras])
    true = np.array([c.camera_pos() for c in cams_true])
    R, s, t = _determine_similarity(est, true)
    aligned = (s * (R @ est.T)).T + t
    err = np.linalg.norm(aligned - true, axis=1)
    spread = np.linalg.norm(true.max(0) - true.min(0))
    assert err.max() < 0.05 * spread, f"camera errors {err / spread}"

    # prebundle caching file exists with the right signature.
    with open(os.path.join(scene_path, "prebundle.sfm"), "rb") as f:
        assert f.read(14) == b"MVE_PREBUNDLE\n"
    # undistorted embeddings were produced.
    assert scene.get_view_by_id(0).has_image("undistorted")


def test_sfm_reprojection_quality(reconstructed_scene):
    """Final BA reprojection RMSE stays at sub-pixel scale in normalized
    units (the reference's own runs on this generator converge to ~1e-4;
    bench_baseline.json reproj context). Note: reprojection cannot be
    recomputed from the saved bundle — the MVE bundle format stores 2D
    ref positions as zeros (the reference writes them the same way)."""
    _, _, incremental = reconstructed_scene
    assert incremental is not None and incremental.last_ba_status is not None
    rmse = float(incremental.last_ba_status.final_mse) ** 0.5
    assert rmse < 2e-3, f"reprojection RMSE {rmse:.6f} (normalized units)"


def test_mvs_stage(reconstructed_scene):
    scene_path = reconstructed_scene[0]
    from mve_tpu.apps import dmrecon as dmapp

    n = reconstruct_views(
        scene_path, scale=1,
        settings=Settings(num_sweep_planes=16, num_propagation_iters=4))
    assert n >= 5
    scene = Scene(scene_path)
    view = scene.get_view_by_id(0)
    depth = view.get_image("depth-L1")
    assert depth is not None
    # Fill gate anchored to the REFERENCE binaries run on THIS exact
    # scene (2026-08-21, rebuilt reference dmrecon -s1 on the fixture
    # scene): reference per-view fills [0.540, 0.516, 0.514, 0.519,
    # 0.541, 0.512], mean 0.5238. Gate AT parity minus measurement noise
    # (r05: >= 0.52) so shipping worse-than-reference fill fails the
    # suite (r04 gated a hair under parity and the gap sat green).
    assert dmapp.LAST_STATS["depth_fill"] >= 0.52, dmapp.LAST_STATS
    assert (depth > 0).mean() > 0.50, f"view0 fill {(depth > 0).mean():.3f}"


def test_fusion_and_fssr_stage(reconstructed_scene, e2e_dir):
    scene_path = reconstructed_scene[0]
    pset_path = os.path.join(e2e_dir, "pset.ply")
    mesh = scene_to_pointset(
        scene_path, pset_path, dmname="depth-L1", image="undist-L1",
        with_normals=True, with_scale=True, with_conf=True)
    assert mesh.num_vertices() > 2000
    assert mesh.has_vertex_normals() and mesh.has_vertex_values()

    surf_path = os.path.join(e2e_dir, "surface.ply")
    surf = fssr_reconstruct(pset_path, surf_path)
    # Face-count band: a sane surface of this scene triangulates to the
    # order of the point count, not a sliver (round-3 lesson: face
    # counts swung with solver quality and nothing gated them).
    assert 1000 < surf.num_faces() < 40 * mesh.num_vertices(), (
        f"{surf.num_faces()} faces from {mesh.num_vertices()} points")
    # Surface must carry interpolated confidences/scales for meshclean.
    assert surf.has_vertex_confidences() and surf.has_vertex_values()

    clean_path = os.path.join(e2e_dir, "clean.ply")
    cleaned = mesh_clean(surf_path, clean_path, threshold=0.1, component_size=100)
    assert cleaned.num_faces() > 500
    assert os.path.getsize(clean_path) > 0
