"""Per-pixel local view selection (local_view_selection.cc recast)."""

import numpy as np
import jax.numpy as jnp

from mve_tpu.mvs.view_selection import _parallax_weight, local_view_selection


def test_parallax_weight_curve():
    # Peak at 20 deg, asymmetric falloff (mvs_tools.h:56-69).
    w20 = float(_parallax_weight(jnp.cos(jnp.deg2rad(20.0))))
    w5 = float(_parallax_weight(jnp.cos(jnp.deg2rad(5.0))))
    w60 = float(_parallax_weight(jnp.cos(jnp.deg2rad(60.0))))
    assert w20 > 0.999
    assert w5 < w20 and w60 < w20
    np.testing.assert_allclose(w5, np.exp(-(15.0**2) / (2 * 25.0)), rtol=1e-5)
    np.testing.assert_allclose(w60, np.exp(-(40.0**2) / (2 * 225.0)), rtol=1e-5)


def test_selection_prefers_diverse_views():
    # Reference looks down +z from origin; 4 candidate cameras: two nearly
    # coincident off-x (same epipolar plane), one off-y, one further off-x.
    # With k=2 and equal NCC, selection must not pick the two coincident
    # views together — the epipolar diversity factor forces off-y second.
    H = W = 4
    ray_world = np.zeros((H, W, 3), np.float32)
    ray_world[..., 2] = 1.0
    depth = np.full((H, W), 10.0, np.float32)
    ref_pos = np.zeros(3, np.float32)
    cam_pos = np.array([
        [3.0, 0.0, 0.0],     # view 0: off-x
        [3.1, 0.0, 0.0],     # view 1: nearly identical to view 0
        [0.0, 3.0, 0.0],     # view 2: off-y (different epipolar plane)
        [6.0, 0.0, 0.0],     # view 3: further off-x
    ], np.float32)
    ncc = np.full((4, H, W), 0.9, np.float32)
    ncc[2] = 0.85  # slightly worse NCC must still win via diversity

    sel, valid = local_view_selection(
        jnp.asarray(ncc), jnp.asarray(depth), jnp.asarray(ray_world),
        jnp.asarray(ref_pos), jnp.asarray(cam_pos), k=2)
    sel = np.asarray(sel)
    assert np.asarray(valid).all()
    first = set(np.unique(sel[0]))
    second = set(np.unique(sel[1]))
    # First pick: best weighted NCC (view 0 or 1); second: the off-y view.
    assert first <= {0, 1}
    assert second == {2}


def test_selection_masks_low_ncc():
    H = W = 2
    ray_world = np.zeros((H, W, 3), np.float32)
    ray_world[..., 2] = 1.0
    depth = np.ones((H, W), np.float32)
    cam_pos = np.array([[0.3, 0, 0], [0, 0.3, 0]], np.float32)
    ncc = np.stack([np.full((H, W), 0.1, np.float32),   # below min_ncc
                    np.full((H, W), 0.8, np.float32)])
    sel, valid = local_view_selection(
        jnp.asarray(ncc), jnp.asarray(depth), jnp.asarray(ray_world),
        jnp.zeros(3, jnp.float32), jnp.asarray(cam_pos), k=2,
        min_ncc=0.3)
    valid = np.asarray(valid)
    sel = np.asarray(sel)
    assert np.all(sel[0] == 1) and valid[0].all()
    assert not valid[1].any()  # only one view passes min_ncc


def test_sel_scorer_matches_topk_when_selection_is_topk():
    # With J == k the selected-view scorer must agree with the all-views
    # top-k scorer (selection covers every view).
    import jax
    from mve_tpu.mvs.patch import ncc_score_box, ncc_score_box_sel

    rng = np.random.default_rng(5)
    H = W = 16
    J = 2
    ref = rng.random((H, W), np.float32)
    neigh = rng.random((J, H, W), np.float32)
    T = np.tile(np.eye(3, dtype=np.float32), (J, 1, 1))
    tvec = np.zeros((J, 3), np.float32)
    ray_z = np.ones((H, W), np.float32)
    depths = np.ones((1, H, W), np.float32)

    s_ref, k_ref = ncc_score_box(
        jnp.asarray(ref), jnp.asarray(neigh), jnp.asarray(T),
        jnp.asarray(tvec), jnp.asarray(ray_z), jnp.asarray(depths),
        filter_width=5, top_k=2)
    sel = np.stack([np.zeros((H, W), np.int32), np.ones((H, W), np.int32)])
    s_sel, k_sel = ncc_score_box_sel(
        jnp.asarray(ref), jnp.asarray(neigh), jnp.asarray(T),
        jnp.asarray(tvec), jnp.asarray(ray_z), jnp.asarray(depths),
        jnp.asarray(sel), jnp.ones((2, H, W), bool), filter_width=5)
    np.testing.assert_allclose(np.asarray(s_sel), np.asarray(s_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_sel), np.asarray(k_ref),
                               atol=1e-5)
