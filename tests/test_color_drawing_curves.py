"""Unit tests for image_color, image_drawing, mesh_tools, math.curve and
the sfm visualizer (reference: libs/mve/image_color.h,
libs/mve/image_drawing.h, libs/mve/mesh_tools.cc, libs/math/bezier_curve.h,
libs/math/bspline.h, libs/sfm/visualizer.h)."""

import numpy as np

from mve_tpu.core import image_color as ic
from mve_tpu.core.image_drawing import (draw_line, draw_circle, draw_box,
                                        draw_rectangle_filled)
from mve_tpu.core.mesh import TriangleMesh
from mve_tpu.core.mesh_tools import (mesh_transform, mesh_merge,
                                     mesh_components,
                                     mesh_delete_small_components)
from mve_tpu.math.curve import bezier, bspline_uniform_cubic
from mve_tpu.sfm.visualizer import draw_keypoints, draw_matches


def test_color_roundtrips():
    rng = np.random.RandomState(3)
    rgb = rng.rand(64, 3)
    assert np.allclose(ic.linear_to_srgb(ic.srgb_to_linear(rgb)), rgb,
                       atol=1e-6)
    assert np.allclose(ic.xyz_to_rgb(ic.rgb_to_xyz(rgb)), rgb, atol=1e-6)
    xyz = ic.rgb_to_xyz(rgb)
    assert np.allclose(ic.lab_to_xyz(ic.xyz_to_lab(xyz)), xyz, atol=1e-5)
    assert np.allclose(ic.ycbcr_to_rgb(ic.rgb_to_ycbcr(rgb)), rgb, atol=1e-5)


def test_color_reference_points():
    # White in sRGB maps to the D65 white point in XYZ and L*=100.
    white = np.array([[1.0, 1.0, 1.0]])
    lab = ic.xyz_to_lab(ic.rgb_to_xyz(white))
    assert abs(lab[0, 0] - 100.0) < 1e-3
    assert abs(lab[0, 1]) < 0.5 and abs(lab[0, 2]) < 0.5
    # Black maps to L*=0 and YCbCr luma 0.
    black = np.zeros((1, 3))
    assert abs(ic.xyz_to_lab(ic.rgb_to_xyz(black))[0, 0]) < 1e-6
    assert abs(ic.rgb_to_ycbcr(black)[0, 0]) < 1e-6


def test_draw_line_endpoints_and_connectivity():
    img = np.zeros((16, 16, 3), np.uint8)
    draw_line(img, 2, 3, 12, 9, (255, 0, 0))
    assert (img[3, 2] == (255, 0, 0)).all()
    assert (img[9, 12] == (255, 0, 0)).all()
    # 8-connectivity: every column between the endpoints is hit.
    cols = np.where(img[..., 0].any(axis=0))[0]
    assert cols.min() == 2 and cols.max() == 12
    assert len(cols) == 11


def test_draw_circle_box_filled():
    img = np.zeros((32, 32, 3), np.uint8)
    draw_circle(img, 16, 16, 6, (0, 255, 0))
    ys, xs = np.where(img[..., 1] > 0)
    r = np.hypot(xs - 16.0, ys - 16.0)
    assert abs(r.min() - 6.0) < 1.2 and abs(r.max() - 6.0) < 1.2
    assert img[16, 16, 1] == 0  # outline only, not filled

    img2 = np.zeros((16, 16, 3), np.uint8)
    draw_box(img2, 2, 3, 10, 12, (0, 0, 255))
    assert (img2[3, 2:11, 2] == 255).all() and (img2[12, 2:11, 2] == 255).all()
    assert (img2[3:13, 2, 2] == 255).all() and (img2[3:13, 10, 2] == 255).all()
    assert img2[7, 6, 2] == 0

    img3 = np.zeros((16, 16, 3), np.uint8)
    draw_rectangle_filled(img3, 2, 3, 10, 12, (9, 9, 9))
    assert (img3[3:13, 2:11] == 9).all()
    assert img3[2, 2, 0] == 0 and img3[13, 11, 0] == 0


def test_mesh_transform_and_merge():
    m1 = TriangleMesh()
    m1.vertices = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    m1.faces = np.array([[0, 1, 2]], np.int32)
    m2 = TriangleMesh()
    m2.vertices = np.array([[5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32)
    m2.faces = np.array([[0, 1, 2]], np.int32)
    m2.vertex_confidences = np.array([0.5, 0.5, 0.5], np.float32)

    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    mesh_transform(m1, T)
    assert np.allclose(m1.vertices[0], [1, 2, 3])

    merged = mesh_merge([m1, m2])
    assert merged.num_vertices() == 6 and merged.num_faces() == 2
    assert (merged.faces[1] == [3, 4, 5]).all()
    # m1 had no confidences: padded with ones; m2's preserved.
    assert np.allclose(merged.vertex_confidences, [1, 1, 1, 0.5, 0.5, 0.5])


def test_mesh_components_and_small_component_removal():
    m = TriangleMesh()
    m.vertices = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                           [5, 5, 5], [6, 5, 5], [5, 6, 5],
                           [6, 6, 5], [9, 9, 9]], np.float32)
    m.faces = np.array([[0, 1, 2], [3, 4, 5], [4, 6, 5]], np.int32)
    labels = mesh_components(m)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5] == labels[6]
    assert labels[0] != labels[3]

    removed = mesh_delete_small_components(m, min_vertices=4)
    assert removed > 0
    assert m.num_vertices() == 4 and m.num_faces() == 2


def test_bezier_de_casteljau():
    cp = np.array([[0, 0], [1, 2], [3, 2], [4, 0]], np.float64)
    assert np.allclose(bezier(cp, 0.0), cp[0])
    assert np.allclose(bezier(cp, 1.0), cp[-1])
    # Cubic Bernstein closed form at t=0.5.
    t = 0.5
    b = ((1 - t) ** 3 * cp[0] + 3 * (1 - t) ** 2 * t * cp[1]
         + 3 * (1 - t) * t**2 * cp[2] + t**3 * cp[3])
    assert np.allclose(bezier(cp, t), b)
    # Batched parameters.
    ts = np.linspace(0, 1, 7)
    out = bezier(cp, ts)
    assert out.shape == (7, 2)
    assert np.allclose(out[0], cp[0]) and np.allclose(out[-1], cp[-1])


def test_bspline_uniform_cubic():
    # Collinear equally-spaced control points => the curve is the line.
    cp = np.stack([np.arange(6.0), np.zeros(6)], axis=1)
    ts = np.linspace(0, 1, 9)
    out = bspline_uniform_cubic(cp, ts)
    assert out.shape == (9, 2)
    assert np.allclose(out[:, 1], 0.0)
    assert (np.diff(out[:, 0]) > 0).all()  # monotone along the line
    # Convex-hull property for a generic control polygon.
    rng = np.random.RandomState(0)
    cp2 = rng.rand(8, 3)
    out2 = bspline_uniform_cubic(cp2, np.linspace(0, 1, 33))
    assert (out2 >= cp2.min(axis=0) - 1e-12).all()
    assert (out2 <= cp2.max(axis=0) + 1e-12).all()


def test_visualizer_keypoints_and_matches():
    img = np.zeros((24, 32), np.uint8)
    out = draw_keypoints(img, [8, 20], [10, 5], scales=[3, 2])
    assert out.shape == (24, 32, 3)
    assert out.any()  # circles drawn
    canvas = draw_matches(np.zeros((24, 32), np.uint8),
                          np.zeros((20, 16), np.uint8),
                          [(4, 4)], [(8, 8)])
    assert canvas.shape == (24, 48, 3)
    assert (canvas[4, 4] == (0, 255, 0)).all()
    assert (canvas[8, 32 + 8] == (0, 255, 0)).all()
