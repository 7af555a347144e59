"""Render layer: camera matrices, trackball, rasterizer, meshview app.

Counterpart of the reference's ogl layer which has no unit tests at all
(GL needs a context); the software rasterizer makes the draw path
testable headlessly (SURVEY §2.7).
"""

import os

import numpy as np

from mve_tpu.core.mesh import TriangleMesh
from mve_tpu.render import (Camera, CamTrackball, Camera2D, look_at,
                            render_mesh, overlay_points, overlay_lines,
                            frustum_segments, axis_segments, aabb_segments,
                            turntable_views, fit_view_to_points)


def _unit_quad(z=0.0, color=None):
    m = TriangleMesh()
    m.vertices = np.array([[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]],
                          np.float32)
    m.faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    if color is not None:
        m.vertex_colors = np.tile(np.asarray(color + (1.0,), np.float32),
                                  (4, 1))
    return m


def _front_camera(dist=3.0, w=64, h=64):
    cam = Camera()
    cam.width, cam.height = w, h
    cam.pos = np.array([0, 0, dist], np.float32)
    cam.viewing_dir = np.array([0, 0, -1], np.float32)
    cam.set_fov(60.0)
    cam.update_matrices()
    return cam


class TestCameraMath:
    def test_look_at_transforms_target_to_neg_z(self):
        view = look_at([1, 2, 3], [0, 0, -1], [0, 1, 0])
        p = view @ np.array([1, 2, 0, 1.0])
        np.testing.assert_allclose(p[:3], [0, 0, -3], atol=1e-6)

    def test_view_inverse_consistent(self):
        cam = _front_camera()
        np.testing.assert_allclose(cam.view @ cam.inv_view, np.eye(4),
                                   atol=1e-5)
        np.testing.assert_allclose(cam.proj @ cam.inv_proj, np.eye(4),
                                   atol=1e-4)

    def test_projection_ndc_range(self):
        cam = _front_camera(dist=3.0)
        # Point at the center, 3 units in front -> NDC origin, z in (-1,1)
        clip = cam.proj @ cam.view @ np.array([0, 0, 0, 1.0])
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-6)
        assert -1.0 < ndc[2] < 1.0


class TestTrackball:
    def test_orbit_preserves_distance(self):
        cam = _front_camera()
        tb = CamTrackball(cam)
        tb.set_camera_params([0, 0, 5.0], [0, 0, 0], [0, 1, 0])
        for (x0, y0, x1, y1) in [(32, 32, 40, 30), (10, 50, 50, 10),
                                 (0, 0, 63, 63)]:
            tb.rotate(x0, y0, x1, y1)
            assert np.isclose(np.linalg.norm(tb.get_campos()), 5.0,
                              atol=1e-9)
            # basis stays orthonormal
            assert np.isclose(np.dot(tb.get_viewdir(), tb.get_upvec()), 0.0,
                              atol=1e-9)

    def test_zoom_scales_radius(self):
        cam = _front_camera()
        tb = CamTrackball(cam)
        tb.set_camera_params([0, 0, 4.0], [0, 0, 0], [0, 1, 0])
        tb.zoom(0.5)
        assert np.isclose(np.linalg.norm(tb.get_campos()), 2.0)

    def test_pan_moves_center_in_view_plane(self):
        cam = _front_camera()
        tb = CamTrackball(cam)
        tb.set_camera_params([0, 0, 4.0], [0, 0, 0], [0, 1, 0])
        tb.pan(0.1, 0.0)
        moved = tb.tb_center
        assert abs(moved[0]) > 0 and np.isclose(moved[2], 0.0)

    def test_camera2d_roundtrip(self):
        c2 = Camera2D(640, 480)
        c2.fit(1000, 800)
        pts = np.array([[12.5, 700.0], [0, 0]])
        np.testing.assert_allclose(
            c2.viewport_to_image(c2.image_to_viewport(pts)), pts)


class TestRasterizer:
    def test_quad_coverage_and_color(self):
        cam = _front_camera()
        rgb, depth = render_mesh(_unit_quad(color=(1.0, 0.0, 0.0)),
                                 cam.view, cam.proj, 64, 64)
        # center pixel hit, red-dominant, background white at corners
        assert np.isfinite(depth[32, 32])
        assert rgb[32, 32, 0] > 2.0 * rgb[32, 32, 1]
        assert not np.isfinite(depth[1, 1])
        np.testing.assert_allclose(rgb[1, 1], 1.0)
        # quad occupies a substantial central region
        assert np.isfinite(depth).mean() > 0.2

    def test_zbuffer_orders_surfaces(self):
        near = _unit_quad(z=1.0, color=(0.0, 1.0, 0.0))
        far = _unit_quad(z=-1.0, color=(1.0, 0.0, 0.0))
        # merge into one mesh: far quad first, near second
        m = TriangleMesh()
        m.vertices = np.concatenate([far.vertices, near.vertices])
        m.faces = np.concatenate([far.faces, near.faces + 4])
        m.vertex_colors = np.concatenate([far.vertex_colors,
                                          near.vertex_colors])
        cam = _front_camera(dist=4.0)
        rgb, depth = render_mesh(m, cam.view, cam.proj, 64, 64)
        assert rgb[32, 32, 1] > 2.0 * rgb[32, 32, 0]  # near (green) wins

    def test_depth_increases_with_distance(self):
        cam = _front_camera(dist=4.0)
        _, d_near = render_mesh(_unit_quad(z=1.0), cam.view, cam.proj, 32, 32)
        _, d_far = render_mesh(_unit_quad(z=-1.0), cam.view, cam.proj, 32, 32)
        assert d_near[16, 16] < d_far[16, 16]

    def test_behind_camera_culled(self):
        cam = _front_camera(dist=2.0)
        rgb, depth = render_mesh(_unit_quad(z=5.0), cam.view, cam.proj,
                                 32, 32)
        assert not np.isfinite(depth).any()

    def test_overlay_points_depth_tested(self):
        cam = _front_camera(dist=4.0)
        rgb, depth = render_mesh(_unit_quad(z=0.0, color=(0.5, 0.5, 0.5)),
                                 cam.view, cam.proj, 64, 64)
        # one point in front of the quad, one hidden behind it
        overlay_points(rgb, depth, [[0, 0, 1.0]], [[0, 0, 1.0]],
                       cam.view, cam.proj, radius=0)
        assert np.allclose(rgb[32, 32], [0, 0, 1])
        overlay_points(rgb, depth, [[0.1, 0, -1.0]], [[1, 1, 0.0]],
                       cam.view, cam.proj, radius=0)
        assert not np.allclose(rgb[32, 35], [1, 1, 0])

    def test_overlay_lines_depth_tested(self):
        cam = _front_camera(dist=4.0)
        rgb, depth = render_mesh(_unit_quad(z=0.0, color=(0.5, 0.5, 0.5)),
                                 cam.view, cam.proj, 64, 64)
        before = rgb.copy()
        # line fully behind the quad -> no visible pixels in the interior
        overlay_lines(rgb, depth, [[[-0.5, 0, -2.0], [0.5, 0, -2.0]]],
                      (1, 0, 0), cam.view, cam.proj)
        np.testing.assert_allclose(rgb[28:36, 28:36], before[28:36, 28:36])
        # line in front -> visible
        overlay_lines(rgb, depth, [[[-0.5, 0, 2.0], [0.5, 0, 2.0]]],
                      (1, 0, 0), cam.view, cam.proj)
        assert (rgb[:, :, 0] == 1).any()

    def test_empty_mesh(self):
        cam = _front_camera()
        rgb, depth = render_mesh(TriangleMesh(), cam.view, cam.proj, 16, 16)
        assert rgb.shape == (16, 16, 3) and not np.isfinite(depth).any()


class TestTools:
    def test_frustum_segments_shape(self):
        from mve_tpu.core.camera import CameraInfo
        ci = CameraInfo()
        ci.flen = 1.2
        segs = frustum_segments(ci, size=2.0)
        assert segs.shape == (9, 2, 3)
        # all far corners at distance >= size from apex
        apex = ci.camera_pos()
        far = segs[0, 1]
        assert np.linalg.norm(far - apex) >= 2.0

    def test_axis_and_aabb(self):
        assert axis_segments(2.0).shape == (3, 2, 3)
        segs = aabb_segments([0, 0, 0], [1, 2, 3])
        assert segs.shape == (12, 2, 3)
        lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1)
        assert np.isclose(lengths.sum(), 4 * (1 + 2 + 3))

    def test_turntable_orbits(self):
        frames = list(turntable_views([1, 2, 3], 5.0, 8))
        assert len(frames) == 8
        for pos, vd, up in frames:
            assert np.isclose(np.linalg.norm(pos - [1, 2, 3]), 5.0)
            np.testing.assert_allclose(
                vd, ([1, 2, 3] - pos) / np.linalg.norm([1, 2, 3] - pos),
                atol=1e-12)

    def test_fit_view_contains_points(self):
        pts = np.random.RandomState(0).randn(100, 3) * 2.0
        center, dist = fit_view_to_points(pts, 45.0)
        r = np.max(np.linalg.norm(pts - center, axis=1))
        assert dist > r  # camera outside the bounding sphere


class TestMeshviewApp:
    def test_render_mesh_to_png(self, tmp_path):
        from mve_tpu.apps.meshview import main
        from mve_tpu.core import mesh_io
        m = _unit_quad(color=(0.8, 0.2, 0.2))
        ply = str(tmp_path / "quad.ply")
        mesh_io.save_mesh(m, ply)
        out = str(tmp_path / "render.png")
        assert main([ply, "-o", out, "--width", "80", "--height", "60"]) == 0
        from mve_tpu.core.image_io import load_image
        img = load_image(out)
        assert img.shape[:2] == (60, 80)
        # some red-ish quad pixels present
        assert (img[:, :, 0].astype(int) - img[:, :, 1].astype(int) > 40).any()

    def test_turntable_frames(self, tmp_path):
        from mve_tpu.apps.meshview import main
        from mve_tpu.core import mesh_io
        ply = str(tmp_path / "quad.ply")
        mesh_io.save_mesh(_unit_quad(), ply)
        out = str(tmp_path / "tt.png")
        assert main([ply, "-o", out, "--turntable", "3",
                     "--width", "40", "--height", "30"]) == 0
        for i in range(3):
            assert os.path.exists(str(tmp_path / f"tt_{i:04d}.png"))
