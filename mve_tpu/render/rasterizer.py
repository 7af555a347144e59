"""Software triangle rasterizer (z-buffer, Gouraud headlight shading).

TPU-native replacement for the reference's GL draw path
(libs/ogl/mesh_renderer.h + shader_program.h + vertex_array.h): instead
of uploading vertex buffers to a GL context, the whole render is one
jitted XLA program — vertices are transformed in a single matmul, and a
`lax.scan` over fixed-size triangle chunks evaluates edge functions
against every pixel, keeping a (H,W) z-buffer and color buffer as the
scan carry.  No data-dependent control flow, static shapes throughout.

Depth is interpolated in NDC (screen-linear, GL-equivalent); shading
attributes (normals, colors) use perspective-correct barycentrics.
Shading is double-sided headlight Lambert, matching the reference's
default mesh shader look.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["render_mesh", "overlay_points", "overlay_lines"]

_EPS_AREA = 1e-12


@functools.partial(
    jax.jit, static_argnames=("width", "height", "chunk"))
def _raster_scan(tri_xy, tri_z, tri_w, tri_normal, tri_color, tri_valid,
                 view_rot, width, height, chunk):
    """Scan over triangle chunks; carry = (zbuf, colorbuf).

    tri_* are padded to a multiple of `chunk`:
      tri_xy (F,3,2) screen coords, tri_z (F,3) NDC depths,
      tri_w (F,3) clip-space w (for perspective-correct attributes),
      tri_normal/tri_color (F,3,3) per-vertex attributes,
      tri_valid (F,) bool.
    """
    n_pix = width * height
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    pix = jnp.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], axis=-1)  # (P,2)

    n_chunks = tri_xy.shape[0] // chunk
    xs_c = tri_xy.reshape(n_chunks, chunk, 3, 2)
    zs_c = tri_z.reshape(n_chunks, chunk, 3)
    ws_c = tri_w.reshape(n_chunks, chunk, 3)
    nm_c = tri_normal.reshape(n_chunks, chunk, 3, 3)
    cl_c = tri_color.reshape(n_chunks, chunk, 3, 3)
    va_c = tri_valid.reshape(n_chunks, chunk)

    def edge(a, b, p):
        # cross((b-a), (p-a)) for p (P,2) against segment endpoints (C,2)
        return ((b[:, 0] - a[:, 0])[None, :] * (p[:, 1:2] - a[None, :, 1])
                - (b[:, 1] - a[:, 1])[None, :] * (p[:, 0:1] - a[None, :, 0]))

    def body(carry, inp):
        zbuf, cbuf = carry
        xy, z, w, nrm, col, valid = inp
        a, b, c = xy[:, 0], xy[:, 1], xy[:, 2]
        w0 = edge(b, c, pix)                       # (P,C)
        w1 = edge(c, a, pix)
        w2 = edge(a, b, pix)
        area = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))  # (C,)
        inv_area = jnp.where(jnp.abs(area) > _EPS_AREA, 1.0 / area, 0.0)
        l0 = w0 * inv_area[None, :]
        l1 = w1 * inv_area[None, :]
        l2 = w2 * inv_area[None, :]
        ok = ((l0 >= 0) & (l1 >= 0) & (l2 >= 0)
              & (jnp.abs(area) > _EPS_AREA)[None, :] & valid[None, :])
        zpix = l0 * z[None, :, 0] + l1 * z[None, :, 1] + l2 * z[None, :, 2]
        zpix = jnp.where(ok, zpix, jnp.inf)        # (P,C)
        k = jnp.argmin(zpix, axis=1)               # (P,)
        zbest = jnp.take_along_axis(zpix, k[:, None], axis=1)[:, 0]
        hit = zbest < zbuf

        take = lambda arr: jnp.take_along_axis(
            arr, k[:, None], axis=1)[:, 0]
        lam = jnp.stack([take(l0), take(l1), take(l2)], axis=-1)  # (P,3)
        wk = w[k]                                  # (P,3) clip w
        lam_p = lam / jnp.maximum(wk, 1e-20)
        lam_p = lam_p / jnp.maximum(lam_p.sum(-1, keepdims=True), 1e-20)
        normal = jnp.einsum("pk,pkd->pd", lam_p, nrm[k])
        albedo = jnp.einsum("pk,pkd->pd", lam_p, col[k])
        nv = normal @ view_rot.T
        nz = jnp.abs(nv[:, 2]) / jnp.maximum(
            jnp.linalg.norm(nv, axis=-1), 1e-12)
        shade = albedo * (0.25 + 0.75 * nz)[:, None]

        zbuf = jnp.where(hit, zbest, zbuf)
        cbuf = jnp.where(hit[:, None], shade, cbuf)
        return (zbuf, cbuf), None

    zbuf0 = jnp.full((n_pix,), jnp.inf, jnp.float32)
    cbuf0 = jnp.zeros((n_pix, 3), jnp.float32)
    (zbuf, cbuf), _ = jax.lax.scan(
        body, (zbuf0, cbuf0), (xs_c, zs_c, ws_c, nm_c, cl_c, va_c))
    return (zbuf.reshape(height, width),
            cbuf.reshape(height, width, 3))


def render_mesh(mesh, view: np.ndarray, proj: np.ndarray,
                width: int, height: int, background=(1.0, 1.0, 1.0),
                default_color=(0.7, 0.7, 0.7), z_near: float = 1e-3):
    """Render a TriangleMesh to (rgb float32 (H,W,3) in [0,1], depth (H,W)).

    Depth is NDC depth; pixels with no geometry hold +inf.  Triangles
    with any vertex closer than z_near to the camera plane are culled
    (clipping-free near-plane policy — adequate for outside-in viewing,
    same regime as the reference's scene inspector).
    """
    verts = np.asarray(mesh.vertices, np.float32)
    faces = np.asarray(mesh.faces, np.int64).reshape(-1, 3)
    if len(verts) == 0 or len(faces) == 0:
        rgb = np.ones((height, width, 3), np.float32) * np.asarray(
            background, np.float32)
        return rgb, np.full((height, width), np.inf, np.float32)

    mesh.ensure_normals()
    vnorm = np.asarray(mesh.vertex_normals, np.float32)
    if len(vnorm) != len(verts):
        vnorm = np.zeros_like(verts)
        vnorm[:, 2] = 1.0
    if mesh.has_vertex_colors():
        vcol = np.asarray(mesh.vertex_colors, np.float32)[:, :3]
    else:
        vcol = np.broadcast_to(
            np.asarray(default_color, np.float32), verts.shape).copy()

    vp = proj.astype(np.float64) @ view.astype(np.float64)
    hom = np.concatenate([verts, np.ones((len(verts), 1), np.float32)], 1)
    clip = hom.astype(np.float64) @ vp.T                     # (V,4)
    viewz = hom.astype(np.float64) @ view.astype(np.float64)[2]  # (V,)
    w = clip[:, 3]
    safe_w = np.where(np.abs(w) > 1e-12, w, 1e-12)
    ndc = clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[:, 1] * 0.5) * height
    sxy = np.stack([sx, sy], axis=-1).astype(np.float32)

    f = faces
    tri_xy = sxy[f]                                          # (F,3,2)
    tri_z = ndc[:, 2].astype(np.float32)[f]                  # (F,3)
    tri_w = w.astype(np.float32)[f]
    tri_normal = vnorm[f]
    tri_color = vcol[f]
    tri_valid = np.all(viewz[f] < -z_near, axis=1)

    n_pix = width * height
    chunk = max(1, min(32, (1 << 23) // max(n_pix, 1)))
    pad = (-len(f)) % chunk
    if pad:
        zpad = np.zeros
        tri_xy = np.concatenate([tri_xy, zpad((pad, 3, 2), np.float32)])
        tri_z = np.concatenate([tri_z, zpad((pad, 3), np.float32)])
        tri_w = np.concatenate([tri_w, np.ones((pad, 3), np.float32)])
        tri_normal = np.concatenate([tri_normal, zpad((pad, 3, 3), np.float32)])
        tri_color = np.concatenate([tri_color, zpad((pad, 3, 3), np.float32)])
        tri_valid = np.concatenate([tri_valid, np.zeros(pad, bool)])

    zbuf, cbuf = _raster_scan(
        jnp.asarray(tri_xy), jnp.asarray(tri_z), jnp.asarray(tri_w),
        jnp.asarray(tri_normal), jnp.asarray(tri_color),
        jnp.asarray(tri_valid), jnp.asarray(view[:3, :3], jnp.float32),
        width=width, height=height, chunk=chunk)
    zbuf = np.array(zbuf)
    rgb = np.array(cbuf)
    bg = np.asarray(background, np.float32)
    miss = ~np.isfinite(zbuf)
    rgb[miss] = bg
    return rgb, zbuf


def _project(points: np.ndarray, view: np.ndarray, proj: np.ndarray,
             width: int, height: int):
    """Project world points -> (screen xy, ndc z, in-front mask)."""
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    hom = np.concatenate([pts, np.ones((len(pts), 1))], 1)
    clip = hom @ (proj.astype(np.float64) @ view.astype(np.float64)).T
    w = clip[:, 3]
    front = w > 1e-9
    safe_w = np.where(np.abs(w) > 1e-12, w, 1e-12)
    ndc = clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[:, 1] * 0.5) * height
    return np.stack([sx, sy], -1), ndc[:, 2], front


def overlay_points(rgb: np.ndarray, depth: np.ndarray, points, colors,
                   view: np.ndarray, proj: np.ndarray,
                   radius: int = 1, depth_bias: float = 1e-4) -> None:
    """Depth-tested point splats composited over a rendered frame in place.

    Covers the reference GUI's SfM-point overlay (umve scene inspector
    addin_sfm_renderer): points behind already-rendered geometry are
    hidden via the rasterizer's z-buffer.
    """
    h, w = depth.shape
    sxy, ndcz, front = _project(points, view, proj, w, h)
    colors = np.asarray(colors, np.float32).reshape(-1, 3)
    if len(colors) == 1:
        colors = np.broadcast_to(colors, (len(sxy), 3))
    colors = np.asarray(colors, np.float32)
    xi = np.round(sxy[:, 0]).astype(np.int64)
    yi = np.round(sxy[:, 1]).astype(np.int64)
    # Far-to-near scatter per splat offset: overlapping points resolve to
    # the nearest one (SfM bundles carry 1e5+ points — the splat loop is
    # over the (2r+1)^2 offsets, not the points).
    order = np.argsort(-ndcz, kind="stable")
    xi, yi, zz = xi[order], yi[order], ndcz[order]
    fr = front[order]
    cols = colors[order]
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            px = xi + dx
            py = yi + dy
            ok = fr & (px >= 0) & (px < w) & (py >= 0) & (py < h)
            pxo, pyo = px[ok], py[ok]
            vis = zz[ok] <= depth[pyo, pxo] + depth_bias
            rgb[pyo[vis], pxo[vis]] = cols[ok][vis]


def overlay_lines(rgb: np.ndarray, depth: np.ndarray, segments, color,
                  view: np.ndarray, proj: np.ndarray,
                  samples_per_px: float = 1.5,
                  depth_bias: float = 1e-4) -> None:
    """Depth-tested world-space line segments drawn over a frame in place.

    segments: (N,2,3) world endpoints.  Each segment is sampled densely
    in world space and projected, so perspective foreshortening and
    z-buffer occlusion are correct without a clipping stage.  Covers the
    reference GUI's frusta/axis wireframes (ogl/render_tools.h).
    """
    h, w = depth.shape
    color = np.asarray(color, np.float32)
    vp = proj.astype(np.float64) @ view.astype(np.float64)
    w_eps = 1e-6
    for seg in np.asarray(segments, np.float64).reshape(-1, 2, 3):
        p0, p1 = seg
        # Clip against w > eps in clip space first: a behind-camera
        # endpoint's projection is meaningless and would collapse the
        # sample-count estimate for partially visible segments.
        w0 = vp[3] @ np.append(p0, 1.0)
        w1 = vp[3] @ np.append(p1, 1.0)
        if w0 <= w_eps and w1 <= w_eps:
            continue
        t0, t1 = 0.0, 1.0
        if w0 <= w_eps:
            t0 = (w_eps - w0) / (w1 - w0)
        elif w1 <= w_eps:
            t1 = (w_eps - w0) / (w1 - w0)
        p0c = p0 + (p1 - p0) * t0
        p1c = p0 + (p1 - p0) * t1
        s, _, f = _project(np.stack([p0c, p1c]), view, proj, w, h)
        if not f.any():
            continue
        n = int(max(2, min(4096, np.linalg.norm(s[1] - s[0]) * samples_per_px)))
        ts = np.linspace(0.0, 1.0, n)
        pts = p0c[None] * (1 - ts)[:, None] + p1c[None] * ts[:, None]
        sxy, ndcz, front = _project(pts, view, proj, w, h)
        xi = np.round(sxy[:, 0]).astype(int)
        yi = np.round(sxy[:, 1]).astype(int)
        ok = (front & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xi, yi, zz = xi[ok], yi[ok], ndcz[ok]
        vis = zz <= depth[yi, xi] + depth_bias
        rgb[yi[vis], xi[vis]] = color
