"""On-disk interop with the reference MVE binaries (skip-if-absent).

Locks in what the round-1 builder verified manually for
bench_baseline.json: scenes written by this framework are consumed by the
unmodified reference apps and vice versa. Set MVE_REF_APPS to the
reference's built `apps/` directory; the default probes the throwaway
build at /tmp/mve_ref_build/apps.
"""

import os
import subprocess

import numpy as np
import pytest

REF_APPS = os.environ.get("MVE_REF_APPS", "/tmp/mve_ref_build/apps")


def _ref_bin(name: str) -> str:
    path = os.path.join(REF_APPS, name, name)
    if not os.path.isfile(path) or not os.access(path, os.X_OK):
        pytest.skip(f"reference binary {path} not available")
    return path


def _run(args):
    proc = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        f"{args[0]} failed rc={proc.returncode}\n{proc.stdout[-1500:]}"
        f"\n{proc.stderr[-1500:]}")
    return proc.stdout


def test_reference_dmrecon_consumes_our_scene(tmp_path):
    """Framework-written scene (meta.ini + MVEI embeddings + synth_0.out)
    -> reference dmrecon -> we read the reference-written depth map."""
    dmrecon = _ref_bin("dmrecon")
    from mve_tpu.core import Scene
    from tests.synthetic import make_plane_scene, expected_ray_depth

    scene_path = str(tmp_path / "scene")
    make_plane_scene(scene_path, n_views=5, width=96, height=72)

    _run([dmrecon, "-s0", "--force", scene_path])

    scene = Scene(scene_path)
    view = scene.get_view_by_id(0)
    depth = view.get_image("depth-L0")
    assert depth is not None, "reference dmrecon wrote no depth embedding"
    depth = np.squeeze(depth)
    valid = depth > 0
    assert valid.mean() > 0.3, f"reference fill only {valid.mean():.2f}"
    w, h = view.get_image_size("undistorted")
    expected = expected_ray_depth(view.camera, w, h)
    rel = np.abs(depth[valid] - expected[valid]) / expected[valid]
    assert np.median(rel) < 0.05


def test_reference_scene2pset_consumes_our_depth_maps(tmp_path):
    """Our dmrecon writes depth maps -> reference scene2pset fuses them ->
    we load the reference-written PLY point set."""
    scene2pset = _ref_bin("scene2pset")
    from mve_tpu.apps.dmrecon import reconstruct_views
    from mve_tpu.core import mesh_io
    from mve_tpu.mvs import Settings
    from tests.synthetic import make_plane_scene

    scene_path = str(tmp_path / "scene")
    make_plane_scene(scene_path, n_views=5, width=96, height=72)
    n = reconstruct_views(scene_path, scale=0,
                          settings=Settings(num_sweep_planes=12,
                                            num_propagation_iters=3,
                                            quiet=True),
                          verbose=False)
    assert n >= 3

    pset = str(tmp_path / "pset.ply")
    _run([scene2pset, "-F0", scene_path, pset])
    mesh = mesh_io.load_mesh(pset)
    assert mesh.num_vertices() > 1000
    z = mesh.vertices[:, 2]
    # The synthetic plane sits at z=5 in world coordinates.
    assert abs(float(np.median(z)) - 5.0) < 0.2
