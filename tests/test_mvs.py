"""MVS depth-map tests on an analytically-rendered plane scene."""

import numpy as np
import pytest

from mve_tpu.core import Scene
from mve_tpu.mvs import DMRecon, Settings

from tests.synthetic import make_plane_scene, expected_ray_depth


@pytest.fixture(scope="module")
def plane_scene(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mvs") / "scene")
    make_plane_scene(path, n_views=5, width=96, height=72)
    return path


def test_dmrecon_plane_depth(plane_scene):
    scene = Scene(plane_scene)
    settings = Settings(ref_view_nr=0, scale=0,
                        num_sweep_planes=16, num_propagation_iters=4)
    recon = DMRecon(scene, settings)
    recon.start()

    view = scene.get_view_by_id(0)
    depth = view.get_image("depth-L0")[:, :, 0]
    conf = view.get_image("conf-L0")[:, :, 0]
    assert recon.filled_ratio > 0.5, f"filled only {recon.filled_ratio:.2f}"

    w, h = view.get_image_size("undistorted")
    expected = expected_ray_depth(view.camera, w, h)
    valid = depth > 0
    rel_err = np.abs(depth[valid] - expected[valid]) / expected[valid]
    assert np.median(rel_err) < 0.02, f"median depth error {np.median(rel_err):.4f}"
    assert conf.max() <= 1.0 and conf.min() >= 0.0


def test_dmrecon_scale_level(plane_scene):
    scene = Scene(plane_scene)
    settings = Settings(ref_view_nr=1, scale=1,
                        num_sweep_planes=12, num_propagation_iters=3)
    DMRecon(scene, settings).start()
    view = scene.get_view_by_id(1)
    depth = view.get_image("depth-L1")[:, :, 0]
    und = view.get_image("undist-L1")
    assert depth.shape == (36, 48)
    assert und.shape[:2] == (36, 48)
    w_half, h_half = 48, 36
    expected = expected_ray_depth(view.camera, w_half, h_half)
    valid = depth > 0
    assert valid.mean() > 0.4
    rel_err = np.abs(depth[valid] - expected[valid]) / expected[valid]
    assert np.median(rel_err) < 0.03


def test_dmrecon_slanted_patches(tmp_path):
    """Joint depth+normal optimization on a strongly oblique plane
    (patch_optimization.cc optimizeDepthAndNormal): depths stay accurate
    and the dz-L embedding carries the optimized patch plane's (dzI, dzJ),
    matching the analytic surface slope."""
    from tests.synthetic import make_tilted_plane_scene, expected_tilted_ray_depth

    slope = 0.7
    path = str(tmp_path / "scene")
    make_tilted_plane_scene(path, slope=slope, n_views=5, width=96, height=72)
    scene = Scene(path)
    settings = Settings(ref_view_nr=0, scale=0,
                        num_sweep_planes=16, num_propagation_iters=4)
    recon = DMRecon(scene, settings)
    recon.start()

    view = scene.get_view_by_id(0)
    depth = view.get_image("depth-L0")[:, :, 0]
    dz = view.get_image("dz-L0")
    assert recon.filled_ratio > 0.5, f"filled only {recon.filled_ratio:.2f}"

    w, h = view.get_image_size("undistorted")
    expected = expected_tilted_ray_depth(view.camera, w, h, slope)
    valid = depth > 0
    rel_err = np.abs(depth[valid] - expected[valid]) / expected[valid]
    assert np.median(rel_err) < 0.02, f"median depth error {np.median(rel_err):.4f}"

    # dz-L holds the patch plane's per-pixel ray-length slope (dzI, dzJ)
    # (dmrecon.cc:314-315). Compare against the analytic slope away from
    # the image border.
    dz_expect = np.zeros_like(expected)
    dz_expect[:, 1:-1] = (expected[:, 2:] - expected[:, :-2]) * 0.5
    m = valid.copy()
    m[:8] = m[-8:] = False
    m[:, :8] = m[:, -8:] = False
    err = np.abs(dz[:, :, 0][m] - dz_expect[m])
    assert np.median(err) < 0.35 * np.median(np.abs(dz_expect[m])) + 1e-4, (
        f"dzI median err {np.median(err):.5f} "
        f"vs |dzI| {np.median(np.abs(dz_expect[m])):.5f}")


def test_progress_tracking(tmp_path):
    """DMRecon updates its Progress struct and honors cancellation
    (reference: dmrecon/progress.h)."""
    from mve_tpu.mvs import DMRecon, Settings
    from mve_tpu.mvs.progress import ReconStatus

    make_plane_scene(str(tmp_path / "scene"), n_views=5)
    from mve_tpu.core import Scene
    scene = Scene(str(tmp_path / "scene"))
    recon = DMRecon(scene, Settings(ref_view_nr=0, scale=0,
                                    num_sweep_planes=4,
                                    num_propagation_iters=2, quiet=True))
    assert recon.progress.status is ReconStatus.IDLE
    recon.start()
    assert recon.progress.status is ReconStatus.IDLE
    assert recon.progress.filled > 0
    assert recon.progress.elapsed() > 0

    recon2 = DMRecon(scene, Settings(ref_view_nr=1, scale=0, quiet=True))
    recon2.progress.cancelled = True
    import pytest
    with pytest.raises(RuntimeError, match="cancelled"):
        recon2.start()
    assert recon2.progress.status is ReconStatus.CANCELLED
