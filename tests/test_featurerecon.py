"""featurerecon: features + matching + triangulation for scenes with
known cameras (reference: apps/featurerecon/featurerecon.cc)."""

import numpy as np

from mve_tpu.core import Scene
from mve_tpu.core.view import View
from mve_tpu.apps.featurerecon import feature_reconstruct

from tests.synthetic import (make_texture, make_cameras,
                             render_two_plane_view)


def test_featurerecon_known_cameras(tmp_path):
    path = str(tmp_path / "scene")
    tex_far = make_texture(seed=7, smooth_sigma=3.0)
    tex_near = make_texture(seed=107, smooth_sigma=3.0)
    cams = make_cameras(4, spread=0.5, seed=7)
    scene = Scene.create(path)
    for i, cam in enumerate(cams):
        view = View.create(scene.view_dir_for_id(i), i)
        img = render_two_plane_view(tex_far, tex_near, cam, 200, 150)
        view.set_image("undistorted", img)
        view.set_camera(cam)
        view.save_view()
        scene.add_view(view)

    bundle = feature_reconstruct(path, verbose=False)
    assert bundle.get_num_cameras() == 4
    assert bundle.get_num_features() > 20

    # Cameras in the bundle are the known poses, untouched.
    for cam, ref in zip(bundle.cameras, cams):
        assert abs(cam.flen - ref.flen) < 1e-6
        assert np.allclose(cam.rot, ref.rot, atol=1e-6)
        assert np.allclose(cam.trans, ref.trans, atol=1e-6)

    # Triangulated points live on the synthetic planes (world z in
    # [far, near] band used by render_two_plane_view) and reproject
    # in front of every observing camera.
    pts = bundle.feature_positions()
    for f in bundle.features[:50]:
        for ref in f.refs:
            cam = bundle.cameras[ref.view_id]
            pc = cam.rot @ f.pos + cam.trans
            assert pc[2] > 0.0

    # The bundle was persisted to the scene directory.
    scene2 = Scene(path)
    loaded = scene2.get_bundle()
    assert loaded.get_num_features() == bundle.get_num_features()
    assert np.allclose(loaded.feature_positions(), pts, atol=1e-4)
