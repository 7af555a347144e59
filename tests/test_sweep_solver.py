"""Direct tests of the rectified plane-sweep MVS solver
(mve_tpu/mvs/sweep_solver.py): device primitives, rectification
geometry, sweep-vs-exact-warp score equivalence, and the
degenerate-pair fallback to the warp solver.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mve_tpu.mvs import sweep_solver as sw
from tests.synthetic import make_plane_scene, expected_ray_depth


# ---------------------------------------------------------------------------
# device primitives
# ---------------------------------------------------------------------------

def test_frac_shift_x_integer_and_fractional():
    rng = np.random.RandomState(0)
    img = rng.rand(6, 12).astype(np.float32)
    # Integer shift: out(y, x) = img(y, x - 3).
    out, valid = sw._frac_shift_x(jnp.asarray(img), jnp.asarray(3.0))
    out = np.asarray(out)
    valid = np.asarray(valid)
    np.testing.assert_allclose(out[:, 3:], img[:, :-3], atol=1e-6)
    assert valid[:, 3:].all() and not valid[:, :3].any()
    # Fractional shift: linear interpolation between x-1 and x-2.
    out, valid = sw._frac_shift_x(jnp.asarray(img), jnp.asarray(1.25))
    out = np.asarray(out)
    expect = 0.75 * img[:, 1:-1] + 0.25 * img[:, :-2]
    np.testing.assert_allclose(out[:, 2:], expect, atol=1e-5)
    # Zero shift: identity.
    out, valid = sw._frac_shift_x(jnp.asarray(img), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)
    assert np.asarray(valid).all()


def test_reindex_cube_identity_and_shift():
    rng = np.random.RandomState(1)
    D, Hr, Wr = 4, 8, 10
    cube = jnp.asarray(rng.rand(D, Hr, Wr).astype(np.float32) * 2 - 1,
                       jnp.bfloat16)
    # Identity homography: table(y, x, :) == cube(:, y, x).
    eye = jnp.eye(3, dtype=jnp.float32)
    tab = np.asarray(sw._reindex_cube(cube, eye, Hr, Wr), np.float32)
    ref = np.asarray(cube, np.float32).transpose(1, 2, 0)
    np.testing.assert_allclose(tab, ref, atol=0.02)
    # Pure translation by (+2, +1): table(y, x) == cube(y+1, x+2).
    M = np.eye(3, dtype=np.float32)
    M[0, 2] = 2.0
    M[1, 2] = 1.0
    tab = np.asarray(sw._reindex_cube(cube, jnp.asarray(M), Hr - 2, Wr - 3),
                     np.float32)
    np.testing.assert_allclose(tab, ref[1:Hr - 1, 2:Wr - 1], atol=0.02)


# ---------------------------------------------------------------------------
# rectification geometry
# ---------------------------------------------------------------------------

def _random_pair(seed=0, min_cross=0.2):
    """Two cameras with a clearly-sideways baseline."""
    from mve_tpu.math.rotation import rodrigues_to_matrix

    rng = np.random.RandomState(seed)
    W, H, f = 64, 48, 0.9
    K = np.array([[f * W, 0, W / 2.0], [0, f * W, H / 2.0], [0, 0, 1.0]])
    R_r = np.eye(3)
    t_r = np.zeros(3)
    R_j = rodrigues_to_matrix(rng.randn(3) * 0.05)
    C_j = np.array([0.6, 0.1, 0.0]) + rng.randn(3) * 0.05
    t_j = -R_j @ C_j
    return K, R_r, t_r, K, R_j, t_j, (W, H)


def test_rectify_pair_epipolar_rows():
    """A world point's rectified projections in both cameras must land on
    the SAME row, with horizontal disparity fB * (1 / rect depth)."""
    K_r, R_r, t_r, K_j, R_j, t_j = _random_pair()[:6]
    wh = _random_pair()[6]
    r = sw.rectify_pair(K_r, R_r, t_r, K_j, R_j, t_j, image_wh=wh)
    assert r is not None
    Mr_inv = np.linalg.inv(r["M_ref"].astype(np.float64))
    Mn_inv = np.linalg.inv(r["M_nei"].astype(np.float64))
    rng = np.random.RandomState(3)
    for _ in range(20):
        X = np.array([rng.uniform(-1, 1), rng.uniform(-0.7, 0.7),
                      rng.uniform(3.0, 8.0)])
        # Project into each camera, then map into rect space.
        def rect_px(K, R, t, Minv):
            pc = R @ X + t
            uv = K @ (pc / pc[2])
            q = Minv @ uv
            return q[:2] / q[2]

        pr = rect_px(K_r, R_r, t_r, Mr_inv)
        pn = rect_px(K_j, R_j, t_j, Mn_inv)
        # Matrices are stored f32: row alignment holds to ~1e-4 px.
        assert abs(pr[1] - pn[1]) < 1e-3, "rows must align after rectification"
        # Disparity = fB * inverse rect depth (z' = e3 . (X - C_ref)).
        zr = float(r["e3"].astype(np.float64) @ (X - (-R_r.T @ t_r)))
        expect = r["fB"] / zr
        assert abs((pr[0] - pn[0]) - expect) < 1e-3


def test_rectify_pair_fitted_grid_covers_ref():
    """With image_wh given, every ref-image corner must map inside the
    fitted rect grid (the round-3 fixed margins clipped 25-50% of the
    image and cost depth-map fill)."""
    for seed in range(6):
        K_r, R_r, t_r, K_j, R_j, t_j, wh = _random_pair(seed)
        r = sw.rectify_pair(K_r, R_r, t_r, K_j, R_j, t_j, image_wh=wh)
        if r is None:
            continue
        W, H = wh
        Wr, Hr = r["rect_wh"]
        c = np.array([[0.5, 0.5, 1], [W - 0.5, 0.5, 1],
                      [0.5, H - 0.5, 1], [W - 0.5, H - 0.5, 1]]).T
        m = r["H_fwd"].astype(np.float64) @ c
        uv = (m[:2] / m[2]).T
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] <= Wr - 1).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] <= Hr - 1).all()


def test_rectify_pair_degenerate_baseline():
    """Baseline parallel to the viewing direction must return None
    (epipole inside the image; the caller falls back to the warp
    solver, dmrecon._sweep_capable)."""
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    R = np.eye(3)
    r = sw.rectify_pair(K, R, np.zeros(3), K, R, np.array([0, 0, -0.5]),
                        image_wh=(64, 48))
    assert r is None


# ---------------------------------------------------------------------------
# sweep-vs-exact-warp equivalence + known-geometry accuracy
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def plane_scene_small(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sweep") / "scene")
    make_plane_scene(path, n_views=5, width=96, height=72)
    return path


def _prepare(scene_path, view_id=0):
    import dataclasses

    from mve_tpu.core import Scene
    from mve_tpu.mvs import dmrecon as dm
    from mve_tpu.mvs.settings import Settings

    scene = Scene(scene_path)
    views = scene.get_views()
    bundle = scene.get_bundle()
    positions = bundle.feature_positions()
    s = Settings(scale=0, quiet=True)
    vis = dm._feature_visibility(bundle, len(views), s.aabb_min, s.aabb_max)
    full_sizes = [v.get_image_size(s.image_embedding) for v in views]
    prep = dm._prepare_view(scene, dataclasses.replace(s, ref_view_nr=view_id),
                            views, positions, vis, full_sizes, view_id)
    return scene, prep, s


def test_sweep_table_matches_exact_warp(plane_scene_small):
    """Table-lookup NCC must agree with the true-warp box NCC at the
    analytic plane depth (the cube + reindex + lookup pipeline vs
    _ncc_box_all) away from image borders."""
    from mve_tpu.mvs.solver import _ncc_box_all, _ref_box_stats
    from mve_tpu.core import Scene

    scene, prep, s = _prepare(plane_scene_small)
    view = scene.get_views()[0]
    H, W = prep["ref"].shape
    depth = expected_ray_depth(view.camera, W, H).astype(np.float32)

    fw, D = 5, 64
    ref = jnp.asarray(prep["ref"])
    neigh = jnp.asarray(np.stack(prep["neigh"]))
    J = neigh.shape[0]
    nvalid = jnp.ones(J, bool)

    # Exact: true-warp box NCC at the analytic depth.
    rstats = _ref_box_stats(ref, fw)
    ncc_x, ok_x = _ncc_box_all(ref, rstats, neigh,
                               nvalid, jnp.asarray(prep["T"]),
                               jnp.asarray(prep["tvec"]),
                               jnp.asarray(prep["ray_z"]),
                               jnp.asarray(depth[None]), fw)
    ncc_x = np.asarray(ncc_x)[:, 0]
    ok_x = np.asarray(ok_x)[:, 0]

    # Sweep: per-pair cube -> reindex -> lookup at the same depth.
    rect_w = max(r["rect_wh"][0] for r in prep["rect"])
    rect_h = max(r["rect_wh"][1] for r in prep["rect"])
    tabs, c_js, w0s, dws = [], [], [], []
    for j, r in enumerate(prep["rect"]):
        assert r is not None
        rref, rok = sw._homography_warp(ref, jnp.asarray(r["M_ref"]),
                                        rect_h, rect_w)
        rnei, nok = sw._homography_warp(neigh[j], jnp.asarray(r["M_nei"]),
                                        rect_h, rect_w)
        dw = r["dw"] / (D - 1)
        cube = sw._build_cube(rref, rok, rnei, nok, jnp.asarray(r["fB"]),
                              jnp.asarray(r["w0"]), jnp.asarray(dw), D, fw)
        tabs.append(sw._reindex_cube(cube, jnp.asarray(r["H_fwd"]), H, W))
        c_js.append(prep["ray_world"] @ r["e3"])
        w0s.append(r["w0"])
        dws.append(dw)
    ncc_t, ok_t = sw._lookup(jnp.stack(tabs), jnp.asarray(np.stack(c_js)),
                             jnp.asarray(w0s, jnp.float32),
                             jnp.asarray(dws, jnp.float32),
                             nvalid, jnp.asarray(depth[None]))
    ncc_t = np.asarray(ncc_t)[:, 0]
    ok_t = np.asarray(ok_t)[:, 0]

    interior = np.zeros((H, W), bool)
    b = fw  # stay clear of box-window border effects
    interior[b:-b, b:-b] = True
    both = ok_x & ok_t & interior[None]
    assert both.mean() > 0.5, "sweep tables lost too much validity"
    diff = np.abs(ncc_t[both] - ncc_x[both])
    # bf16 tables + bilinear reindex + frac-shift vs true warps: scores
    # agree closely where the true NCC is informative.
    assert np.median(diff) < 0.02, f"median |table - exact| = {np.median(diff):.4f}"
    assert np.mean(diff) < 0.05, f"mean |table - exact| = {np.mean(diff):.4f}"


def test_sweep_known_geometry_depth_rmse(plane_scene_small):
    """End-to-end sweep solve on the analytic plane: depth RMSE against
    the exact ray lengths (not just medians — the fill must be dense AND
    accurate)."""
    from mve_tpu.core import Scene
    from mve_tpu.mvs import DMRecon
    from mve_tpu.mvs.settings import Settings

    scene = Scene(plane_scene_small)
    settings = Settings(ref_view_nr=0, scale=0, num_sweep_planes=16,
                        num_propagation_iters=4, quiet=True)
    assert settings.use_sweep
    recon = DMRecon(scene, settings)
    recon.start()
    view = scene.get_view_by_id(0)
    depth = view.get_image("depth-L0")[:, :, 0]
    w, h = view.get_image_size("undistorted")
    expected = expected_ray_depth(view.camera, w, h)
    valid = depth > 0
    # J=4 neighbors with k=4 means borders genuinely lack views on this
    # tiny scene; the dense-fill contract lives in test_pipeline_e2e.
    assert valid.mean() > 0.5, f"fill {valid.mean():.3f}"
    rel = (depth[valid] - expected[valid]) / expected[valid]
    rmse = float(np.sqrt(np.mean(rel ** 2)))
    # The r05 propagation-gated growing accepts boundary-band pixels the
    # strict phase rejected (reference-parity FILL); ~1.5% of accepted
    # pixels carry a large-error tail the reference avoids (documented
    # residual gap), so the RMSE gate is loose while the bulk accuracy
    # is held by the median (reference on this fixture: fill 0.551,
    # rmse 0.0016; ours: fill 0.574, median |rel| 0.0025).
    assert rmse < 0.05, f"relative depth RMSE {rmse:.4f}"
    med = float(np.median(np.abs(rel)))
    assert med < 0.005, f"median relative depth error {med:.4f}"
    from scipy import ndimage

    interior = ndimage.binary_erosion(valid, iterations=2)
    rel_i = (depth[interior] - expected[interior]) / expected[interior]
    rmse_i = float(np.sqrt(np.mean(rel_i ** 2)))
    assert rmse_i < 0.025, f"interior relative depth RMSE {rmse_i:.4f}"


def test_sweep_degenerate_pair_falls_back_to_warp_solver(tmp_path):
    """A scene whose neighbor baselines parallel the viewing direction
    cannot rectify; dmrecon must route those views through the warp
    solver and still produce a depth map (dmrecon._sweep_capable)."""
    from mve_tpu.core import Scene
    from mve_tpu.mvs import dmrecon as dm
    from mve_tpu.mvs.settings import Settings

    # Forward-motion scene: cameras along +z toward the plane.
    from tests.synthetic import (PLANE_EXTENT, PLANE_Z, make_texture,
                                 render_view)
    from mve_tpu.core import CameraInfo, View
    from mve_tpu.core.bundle import Bundle, Feature2D, Feature3D

    path = str(tmp_path / "scene")
    tex = make_texture(seed=5)
    scene = Scene.create(path)
    cams = []
    for i in range(5):
        cam = CameraInfo()
        cam.flen = 0.9
        cam.rot = np.eye(3, dtype=np.float32)
        center = np.array([0.0, 0.0, 0.35 * i], np.float64)
        cam.trans = (-cam.rot.astype(np.float64) @ center).astype(np.float32)
        cams.append(cam)
        view = View.create(scene.view_dir_for_id(i), i)
        view.set_image("undistorted", render_view(tex, cam, 96, 72))
        view.set_camera(cam)
        view.save_view()
        scene.add_view(view)
    scene.save_views()
    bundle = Bundle()
    bundle.cameras = cams
    rng = np.random.RandomState(0)
    for pi in range(60):
        p = np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1.1, 1.1), PLANE_Z])
        refs = []
        for vi, cam in enumerate(cams):
            pc = cam.rot.astype(np.float64) @ p + cam.trans
            refs.append(Feature2D(vi, pi, (pc[:2] / pc[2] * cam.flen
                                           ).astype(np.float32)))
        bundle.features.append(Feature3D(p.astype(np.float32),
                                         np.full(3, 0.5, np.float32), refs))
    scene.set_bundle(bundle)
    scene.save_scene()

    import dataclasses
    s = Settings(scale=0, quiet=True, nr_recon_neighbors=2,
                 num_sweep_planes=8, num_propagation_iters=2)
    views = scene.get_views()
    positions = bundle.feature_positions()
    vis = dm._feature_visibility(bundle, len(views), s.aabb_min, s.aabb_max)
    full_sizes = [v.get_image_size("undistorted") for v in views]
    prep = dm._prepare_view(scene, dataclasses.replace(s, ref_view_nr=2),
                            views, positions, vis, full_sizes, 2)
    assert any(r is None for r in prep["rect"]), (
        "forward-motion pairs should fail rectification")
    assert not dm._sweep_capable(prep, s)
    # The full driver still reconstructs the view via the warp solver.
    results = dm.reconstruct_batch(scene, s, [(2, 0)], verbose=False)
    assert 2 in results and results[2] > 0.3
