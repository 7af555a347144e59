"""Synthetic scene generation shared by MVS/pipeline tests and bench.

Renders views of a textured plane (exact analytic rendering: each pixel's
viewing ray is intersected with the plane and the texture is sampled
bilinearly), builds an on-disk MVE scene with cameras + bundle.
"""

from __future__ import annotations

import numpy as np

from mve_tpu.core import CameraInfo, Scene, View
from mve_tpu.core.bundle import Bundle, Feature2D, Feature3D
from mve_tpu.math.rotation import rodrigues_to_matrix


def make_texture(size=512, seed=0, octaves=4, smooth_sigma=4.0):
    """Multi-scale random texture, band-limited so that bilinear samples
    from slightly different positions stay correlated (without the final
    blur, per-texel noise aliases between views and kills NCC)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(seed)
    tex = np.zeros((size, size), np.float64)
    for o in range(octaves):
        n = size >> (octaves - 1 - o)
        layer = rng.rand(n, n)
        rep = size // n
        layer = np.repeat(np.repeat(layer, rep, 0), rep, 1)
        tex += layer / (2 ** (octaves - 1 - o))
    tex = gaussian_filter(tex, smooth_sigma, mode="wrap")
    tex -= tex.min()
    tex /= max(tex.max(), 1e-9)
    return tex


def _sample_texture(tex, u, v):
    """Bilinear sample; u, v in [0, 1]."""
    H, W = tex.shape
    x = np.clip(u * (W - 1), 0, W - 1.001)
    y = np.clip(v * (H - 1), 0, H - 1.001)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = x - x0
    fy = y - y0
    return (tex[y0, x0] * (1 - fx) * (1 - fy) + tex[y0, x0 + 1] * fx * (1 - fy)
            + tex[y0 + 1, x0] * (1 - fx) * fy + tex[y0 + 1, x0 + 1] * fx * fy)


PLANE_Z = 5.0
PLANE_EXTENT = 4.0  # plane spans [-E, E]^2 at z = PLANE_Z


def make_cameras(n_views=5, flen=0.9, spread=0.45, seed=0):
    """Reference camera at origin looking +z, neighbors offset/rotated."""
    cams = []
    rng = np.random.RandomState(seed)
    for i in range(n_views):
        if i == 0:
            center = np.zeros(3)
            R = np.eye(3)
        else:
            angle = 2 * np.pi * (i - 1) / max(n_views - 1, 1)
            center = np.array([np.cos(angle), np.sin(angle), 0.0]) * spread
            center[2] += rng.randn() * 0.02
            rot = np.array([0.0, 0.0, rng.randn() * 0.01])
            R = np.asarray(rodrigues_to_matrix(rot), np.float64)
        cam = CameraInfo(flen=flen)
        cam.rot = R.astype(np.float32)
        cam.trans = (-R @ center).astype(np.float32)
        cams.append(cam)
    return cams


def render_view(tex, cam: CameraInfo, width: int, height: int) -> np.ndarray:
    """Render the textured plane z=PLANE_Z from a camera; returns (H,W,3) u8."""
    Ki = cam.inverse_calibration(width, height)
    R = cam.rot.astype(np.float64)
    t = cam.trans.astype(np.float64)
    center = -R.T @ t
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=-1)
    dirs_cam = pix @ Ki.T
    dirs_world = dirs_cam @ R  # R^T @ d for each pixel
    # Intersect with plane z = PLANE_Z.
    tt = (PLANE_Z - center[2]) / dirs_world[..., 2]
    px = center[0] + tt * dirs_world[..., 0]
    py = center[1] + tt * dirs_world[..., 1]
    u = (px + PLANE_EXTENT) / (2 * PLANE_EXTENT)
    v = (py + PLANE_EXTENT) / (2 * PLANE_EXTENT)
    gray = _sample_texture(tex, np.clip(u, 0, 1), np.clip(v, 0, 1))
    img = (gray * 255).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


def expected_ray_depth(cam: CameraInfo, width: int, height: int) -> np.ndarray:
    """Analytic ray-length depth of the plane for every pixel."""
    Ki = cam.inverse_calibration(width, height)
    R = cam.rot.astype(np.float64)
    t = cam.trans.astype(np.float64)
    center = -R.T @ t
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=-1)
    dirs_world = (pix @ Ki.T) @ R
    tt = (PLANE_Z - center[2]) / dirs_world[..., 2]
    return tt * np.linalg.norm(dirs_world, axis=-1)


def _tilted_plane_hits(cam: CameraInfo, width: int, height: int, slope: float):
    """Ray/tilted-plane intersections for plane z = PLANE_Z + slope * x.

    Returns (px, py, ray_len): world xy hit coordinates and ray-length
    depth per pixel."""
    Ki = cam.inverse_calibration(width, height)
    R = cam.rot.astype(np.float64)
    t = cam.trans.astype(np.float64)
    center = -R.T @ t
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=-1)
    dirs_world = (pix @ Ki.T) @ R
    n = np.array([-slope, 0.0, 1.0]) / np.sqrt(1.0 + slope * slope)
    p0 = np.array([0.0, 0.0, PLANE_Z])
    denom = dirs_world @ n
    tt = ((p0 - center) @ n) / denom
    px = center[0] + tt * dirs_world[..., 0]
    py = center[1] + tt * dirs_world[..., 1]
    return px, py, tt * np.linalg.norm(dirs_world, axis=-1)


def expected_tilted_ray_depth(cam: CameraInfo, width: int, height: int,
                              slope: float) -> np.ndarray:
    return _tilted_plane_hits(cam, width, height, slope)[2]


def make_tilted_plane_scene(path: str, slope: float = 0.6, n_views=5,
                            width=96, height=72, n_features=60, seed=0):
    """Scene whose surface is a strongly oblique plane z = PLANE_Z +
    slope * x — the regime where fronto-parallel patches underperform and
    the joint depth+normal optimization must win."""
    tex = make_texture(seed=seed)
    cams = make_cameras(n_views)
    scene = Scene.create(path)
    for i, cam in enumerate(cams):
        view = View.create(scene.view_dir_for_id(i), i)
        view.set_camera(cam)
        px, py, _ = _tilted_plane_hits(cam, width, height, slope)
        u = (px + PLANE_EXTENT) / (2 * PLANE_EXTENT)
        v = (py + PLANE_EXTENT) / (2 * PLANE_EXTENT)
        gray = _sample_texture(tex, np.clip(u, 0, 1), np.clip(v, 0, 1))
        img = (gray * 255).astype(np.uint8)
        view.set_image("undistorted", np.stack([img] * 3, axis=-1))
        scene.add_view(view)
    scene.save_views()

    bundle = Bundle()
    bundle.cameras = cams
    side = int(np.ceil(np.sqrt(n_features)))
    gx, gy = np.meshgrid(np.linspace(-0.8, 0.8, side), np.linspace(-0.8, 0.8, side))
    xs = gx.reshape(-1) * PLANE_EXTENT * 0.5
    ys = gy.reshape(-1) * PLANE_EXTENT * 0.5
    pts = np.stack([xs, ys, PLANE_Z + slope * xs], axis=1)[:n_features]
    for pi, p in enumerate(pts):
        refs = []
        for vi, cam in enumerate(cams):
            pc = cam.rot.astype(np.float64) @ p + cam.trans
            if pc[2] <= 0:
                continue
            uv = pc[:2] / pc[2] * cam.flen
            refs.append(Feature2D(vi, pi, uv.astype(np.float32)))
        bundle.features.append(Feature3D(
            p.astype(np.float32), np.array([0.5, 0.5, 0.5], np.float32), refs))
    scene.set_bundle(bundle)
    scene.save_scene()
    return scene


NEAR_Z = 3.5
NEAR_BOUNDS = (-1.6, 0.4, -1.2, 1.0)  # x0, x1, y0, y1 of the near patch


def render_two_plane_view(tex_far, tex_near, cam: CameraInfo,
                          width: int, height: int) -> np.ndarray:
    """Render background plane z=PLANE_Z plus a nearer textured patch at
    z=NEAR_Z — a non-planar scene SfM can initialize on (pure planes are
    rejected by the homography test, bundler_init_pair.cc:62-70)."""
    Ki = cam.inverse_calibration(width, height)
    R = cam.rot.astype(np.float64)
    t = cam.trans.astype(np.float64)
    center = -R.T @ t
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=-1)
    dirs_world = (pix @ Ki.T) @ R

    def hit(z_plane):
        tt = (z_plane - center[2]) / dirs_world[..., 2]
        px = center[0] + tt * dirs_world[..., 0]
        py = center[1] + tt * dirs_world[..., 1]
        return px, py

    fx, fy = hit(PLANE_Z)
    u = (fx + PLANE_EXTENT) / (2 * PLANE_EXTENT)
    v = (fy + PLANE_EXTENT) / (2 * PLANE_EXTENT)
    gray = _sample_texture(tex_far, np.clip(u, 0, 1), np.clip(v, 0, 1))

    nx, ny = hit(NEAR_Z)
    x0, x1, y0, y1 = NEAR_BOUNDS
    near_mask = (nx >= x0) & (nx <= x1) & (ny >= y0) & (ny <= y1)
    nu = (nx - x0) / (x1 - x0)
    nv = (ny - y0) / (y1 - y0)
    near_gray = _sample_texture(tex_near, np.clip(nu, 0, 1), np.clip(nv, 0, 1))
    gray = np.where(near_mask, near_gray, gray)
    img = (gray * 255).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


def make_two_plane_scene(path: str, n_views=6, width=240, height=180, seed=0,
                         with_cameras=True):
    """Scene with ORIGINAL images only (as makescene would create) for the
    full sfmrecon pipeline. Ground-truth cameras returned separately."""
    tex_far = make_texture(seed=seed, smooth_sigma=3.0)
    tex_near = make_texture(seed=seed + 100, smooth_sigma=3.0)
    cams = make_cameras(n_views, spread=0.55, seed=seed)
    scene = Scene.create(path)
    for i, cam in enumerate(cams):
        view = View.create(scene.view_dir_for_id(i), i)
        img = render_two_plane_view(tex_far, tex_near, cam, width, height)
        view.set_original_image(img)
        if with_cameras:
            view.set_camera(cam)
        view.save_view()
        scene.add_view(view)
    scene.save_views()
    return scene, cams


def make_plane_scene(path: str, n_views=5, width=96, height=72,
                     n_features=60, seed=0):
    """Build a full on-disk scene: views with undistorted images + bundle."""
    tex = make_texture(seed=seed)
    cams = make_cameras(n_views)
    scene = Scene.create(path)
    for i, cam in enumerate(cams):
        view = View.create(scene.view_dir_for_id(i), i)
        view.set_camera(cam)
        view.set_image("undistorted", render_view(tex, cam, width, height))
        scene.add_view(view)
    scene.save_views()

    # Bundle: grid of plane points observed in all views.
    rng = np.random.RandomState(seed)
    bundle = Bundle()
    bundle.cameras = cams
    side = int(np.ceil(np.sqrt(n_features)))
    gx, gy = np.meshgrid(np.linspace(-0.8, 0.8, side), np.linspace(-0.8, 0.8, side))
    pts = np.stack([gx.reshape(-1) * PLANE_EXTENT * 0.5,
                    gy.reshape(-1) * PLANE_EXTENT * 0.5,
                    np.full(side * side, PLANE_Z)], axis=1)[:n_features]
    for pi, p in enumerate(pts):
        refs = []
        for vi, cam in enumerate(cams):
            pc = cam.rot.astype(np.float64) @ p + cam.trans
            if pc[2] <= 0:
                continue
            uv = pc[:2] / pc[2] * cam.flen  # normalized obs (unused here)
            refs.append(Feature2D(vi, pi, uv.astype(np.float32)))
        bundle.features.append(Feature3D(p.astype(np.float32),
                                         np.array([0.5, 0.5, 0.5], np.float32), refs))
    scene.set_bundle(bundle)
    scene.save_scene()
    return scene
