"""TPU-native SURF (reference behavior: libs/sfm/surf.h/.cc).

Reproduces the reference pipeline — integral-image box-filter Hessian
responses with the 4x4 kernel-size table (surf.cc:28), strict 26-neighbor
non-maximum suppression on the two middle samples per octave, 3D
quadratic localization with contrast filtering (surf.cc:337-476),
Haar-wavelet sliding-window orientation (surf.cc:517-625) and the
4x4x(dx,dy,|dx|,|dy|) = 64-dim descriptor (surf.cc:667-736) — but
TPU-shaped:

- the summed-area table is two cumsums; every box-filter response map is
  pure strided slicing of the SAT (no per-pixel loops), so all 16
  response maps build as dense jitted ops;
- NMS masks are stacked comparisons; localization is a batched gather
  solve like SIFT's;
- per-keypoint orientation/descriptor stages are fixed-size gather
  kernels vmapped over keypoint batches.

SAT dtype is int32: exact for images up to ~8 MP of uint8 (the feature
stage caps images at 6 MP, bundler_features.cc:40-43).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import image_tools

# Kernel sizes per octave in 1/3 of full size (surf.cc:28).
KERNEL_SIZES = ((3, 5, 7, 9), (5, 9, 13, 17), (9, 17, 25, 33), (17, 33, 49, 65))


@dataclasses.dataclass(frozen=True)
class SurfOptions:
    """surf.h:48-60 defaults."""

    contrast_threshold: float = 500.0
    use_upright_descriptor: bool = False
    max_keypoints_per_octave: int = 4096


@dataclasses.dataclass
class SurfResult:
    x: np.ndarray
    y: np.ndarray
    scale: np.ndarray
    orientation: np.ndarray
    descriptors: np.ndarray  # (N, 64) float32, unit norm

    def __len__(self):
        return len(self.x)


# ---------------------------------------------------------------------------
# summed-area table + box filters
# ---------------------------------------------------------------------------

@jax.jit
def _build_sat(gray_u8):
    """SAT with one row/col zero padding so sat[y, x] = sum over
    [0,y) x [0,x) (matches integral_image semantics)."""
    s = jnp.cumsum(jnp.cumsum(gray_u8.astype(jnp.int32), axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


_SAT_PAD = 256  # covers the largest filter offsets (octave 3: ~196)


def _box(sat_padded, y0, x0, h, w, H, W, step):
    """Box sum over offsets [y0, y0+h) x [x0, x0+w) relative to every
    octave grid point (pixels 0, step, 2*step, ...).

    sat_padded is the SAT edge-padded by _SAT_PAD on each side, so all
    corner reads become static strided slices; border entries read
    clamped values and are masked by the caller.
    """
    oh = (H + step - 1) // step
    ow = (W + step - 1) // step

    def corner(dy, dx):
        ys = _SAT_PAD + dy
        xs = _SAT_PAD + dx
        return sat_padded[ys : ys + (oh - 1) * step + 1 : step,
                          xs : xs + (ow - 1) * step + 1 : step]

    a = corner(y0, x0)
    b = corner(y0, x0 + w)
    c = corner(y0 + h, x0)
    d = corner(y0 + h, x0 + w)
    return d + a - b - c


@functools.partial(jax.jit, static_argnames=("octave", "sample", "H", "W"))
def _response_map(sat, octave: int, sample: int, H: int, W: int):
    """Hessian determinant response map for one (octave, sample)
    (surf.cc:157-220 create_response_map + filter_dxx/dyy/dxy)."""
    fs = KERNEL_SIZES[octave][sample]
    step = 2 ** octave
    fs2 = fs // 2
    weight = 0.912
    inv_karea = 1.0 / (fs * (2 * fs - 1))

    sat_padded = jnp.pad(sat, _SAT_PAD, mode="edge")

    def box(y0, x0, h, w):
        return _box(sat_padded, y0, x0, h, w, H, W, step)

    # Offsets below are the reference's inclusive-SAT corner offsets
    # shifted by +1 for this exclusive SAT (surf.cc filter_dxx/dyy/dxy).
    # Dxx: three side-by-side boxes (w=fs each, h=2fs-1), signs +1,-2,+1.
    dxx = (box(-fs + 1, -fs - fs2 + 0 * fs, 2 * fs - 1, fs)
           - 2 * box(-fs + 1, -fs - fs2 + 1 * fs, 2 * fs - 1, fs)
           + box(-fs + 1, -fs - fs2 + 2 * fs, 2 * fs - 1, fs))
    # Dyy: transposed.
    dyy = (box(-fs - fs2 + 0 * fs, -fs + 1, fs, 2 * fs - 1)
           - 2 * box(-fs - fs2 + 1 * fs, -fs + 1, fs, 2 * fs - 1)
           + box(-fs - fs2 + 2 * fs, -fs + 1, fs, 2 * fs - 1))
    # Dxy: four diagonal quadrant boxes.
    dxy = (box(-fs, -fs, fs, fs)
           - box(-fs, 1, fs, fs)
           - box(1, -fs, fs, fs)
           + box(1, 1, fs, fs))

    dxx_t = dxx.astype(jnp.float32) * inv_karea
    dyy_t = dyy.astype(jnp.float32) * inv_karea
    dxy_t = dxy.astype(jnp.float32) * inv_karea
    resp = dxx_t * dyy_t - weight * dxy_t * dxy_t

    # Zero the border where the filter would read out of bounds
    # (surf.cc:193-199).
    border = fs + fs2 + 1
    ho, wo = resp.shape
    ys = jnp.arange(ho) * step
    xs = jnp.arange(wo) * step
    ymask = (ys >= border) & (ys + border < H)
    xmask = (xs >= border) & (xs + border < W)
    resp = resp * ymask[:, None] * xmask[None, :]
    # Pad to full octave grid size for stacking.
    oh = (H + step - 1) // step
    ow = (W + step - 1) // step
    resp = jnp.pad(resp, ((0, max(0, oh - ho)), (0, max(0, ow - wo))))
    return resp[:oh, :ow]


@jax.jit
def _nms_mask(resp):
    """Strict 26-neighbor maxima of samples 1..2. resp: (4, Ho, Wo)."""
    def pool_max(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 3, 3), (1, 1, 1), "SAME")

    full = pool_max(resp)
    center = resp[1:3]
    # Same-plane 8-neighbor max (center excluded).
    H, W = resp.shape[1], resp.shape[2]
    pads = []
    padded = jnp.pad(center, ((0, 0), (1, 1), (1, 1)), constant_values=-jnp.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            pads.append(padded[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W])
    same = functools.reduce(jnp.maximum, pads)
    above = full[0:2]
    below = full[2:4]
    nb = jnp.maximum(jnp.maximum(above, below), same)
    mask = center > nb
    mask = mask.at[:, 0, :].set(False).at[:, -1, :].set(False)
    mask = mask.at[:, :, 0].set(False).at[:, :, -1].set(False)
    return mask


# ---------------------------------------------------------------------------
# localization (surf.cc:396-476)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("contrast_thr",))
def _localize(resp, ix, iy, isamp, valid, contrast_thr: float):
    """Batched quadratic localization in one octave's (4, Ho, Wo) stack."""
    Ho, Wo = resp.shape[1], resp.shape[2]

    def at(ds, dy, dx):
        return resp[isamp + ds, jnp.clip(iy + dy, 0, Ho - 1), jnp.clip(ix + dx, 0, Wo - 1)]

    bx = -(at(0, 0, 1) - at(0, 0, -1)) * 0.5
    by = -(at(0, 1, 0) - at(0, -1, 0)) * 0.5
    bs = -(at(1, 0, 0) - at(-1, 0, 0)) * 0.5
    c = at(0, 0, 0)
    axx = at(0, 0, 1) + at(0, 0, -1) - 2 * c
    ayy = at(0, 1, 0) + at(0, -1, 0) - 2 * c
    ass = at(1, 0, 0) + at(-1, 0, 0) - 2 * c
    axy = (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1)) * 0.25
    axs = (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1)) * 0.25
    ays = (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0)) * 0.25

    det = (axx * (ayy * ass - ays * ays) - axy * (axy * ass - ays * axs)
           + axs * (axy * ays - ayy * axs))
    singular = jnp.abs(det) < 1e-5
    det_safe = jnp.where(singular, 1.0, det)
    # Solve A dx = b via adjugate.
    i00 = (ayy * ass - ays * ays) / det_safe
    i01 = (axs * ays - axy * ass) / det_safe
    i02 = (axy * ays - axs * ayy) / det_safe
    i11 = (axx * ass - axs * axs) / det_safe
    i12 = (axs * axy - axx * ays) / det_safe
    i22 = (axx * ayy - axy * axy) / det_safe
    fx = i00 * bx + i01 * by + i02 * bs
    fy = i01 * bx + i11 * by + i12 * bs
    fs_ = i02 * bx + i12 * by + i22 * bs

    value = c - 0.5 * (bx * fx + by * fy + bs * fs_)
    keep = (valid & ~singular
            & (jnp.maximum(jnp.maximum(jnp.abs(fx), jnp.abs(fy)), jnp.abs(fs_)) <= 0.5)
            & (value >= contrast_thr))
    return fx, fy, fs_, keep


# ---------------------------------------------------------------------------
# Haar responses + orientation + descriptor
# ---------------------------------------------------------------------------

def _haar(sat, x, y, fs, H, W):
    """Haar dx/dy response at integer (x, y) with half-size fs
    (surf.cc:628-664 filter_dx_dy; corner offsets shifted +1 for the
    exclusive SAT). Batched over x/y arrays."""
    def at(yy, xx):
        return sat[jnp.clip(yy, 0, H), jnp.clip(xx, 0, W)].astype(jnp.float32)

    x1 = at(y - fs, x - fs)
    x2 = at(y - fs, x)
    x3 = at(y - fs, x + 1)
    x4 = at(y - fs, x + fs + 1)
    x5 = at(y + fs + 1, x - fs)
    x6 = at(y + fs + 1, x)
    x7 = at(y + fs + 1, x + 1)
    x8 = at(y + fs + 1, x + fs + 1)
    y1 = at(y, x - fs)
    y2 = at(y, x + fs + 1)
    y3 = at(y + 1, x - fs)
    y4 = at(y + 1, x + fs + 1)
    norm = ((2 * fs + 1) * fs * (fs + 1)).astype(jnp.float32)
    dx = ((x8 + x2 - x4 - x6) - (x7 + x1 - x3 - x5)) / norm
    dy = ((x8 + y1 - x5 - y2) - (y4 + x1 - y3 - x4)) / norm
    return dx, dy


def _circle_samples():
    """The 109 (rx, ry) offsets of the radius-6 circle (surf.cc:566-577)
    and the matching gaussian weights (sigma 2.5)."""
    offs = []
    for ry in range(-5, 6):
        for rx in range(-5, 6):
            if rx * rx + ry * ry < 36:
                offs.append((rx, ry))
    offs = np.array(offs, np.int32)
    w = np.exp(-(offs[:, 0] ** 2 + offs[:, 1] ** 2) / (2.0 * 2.5**2)).astype(np.float32)
    return offs, w


_CIRCLE_OFFS, _CIRCLE_W = _circle_samples()


@jax.jit
def _orientations(sat, kx, ky, kscale, valid):
    """Sliding-window dominant orientation (surf.cc:517-625), batched."""
    H = sat.shape[0] - 1
    W = sat.shape[1] - 1
    ix = (kx + 0.5).astype(jnp.int32)
    iy = (ky + 0.5).astype(jnp.int32)
    iscale = kscale.astype(jnp.int32)
    spacing = 8 * iscale + 1
    inside = ((ix >= spacing) & (iy >= spacing)
              & (ix + spacing < W) & (iy + spacing < H))

    offs = jnp.asarray(_CIRCLE_OFFS)
    gw = jnp.asarray(_CIRCLE_W)

    def per_kp(ix1, iy1, s1):
        xs = ix1 + offs[:, 0] * s1
        ys = iy1 + offs[:, 1] * s1
        dx, dy = _haar(sat, xs, ys, 2 * s1, H, W)
        dx = dx * gw
        dy = dy * gw
        ang = jnp.arctan2(dy, dx)
        # 16 windows of width pi/3 stepping pi/8.
        centers = -jnp.pi + jnp.arange(16) * (jnp.pi / 8.0)
        half = jnp.pi / 6.0
        diff = jnp.abs(((ang[None, :] - centers[:, None]) + jnp.pi)
                       % (2 * jnp.pi) - jnp.pi)
        in_win = diff < half
        sum_dx = jnp.sum(jnp.where(in_win, dx[None, :], 0.0), axis=1)
        sum_dy = jnp.sum(jnp.where(in_win, dy[None, :], 0.0), axis=1)
        length = sum_dx**2 + sum_dy**2
        best = jnp.argmax(length)
        return jnp.arctan2(sum_dy[best], sum_dx[best])

    ori = jax.vmap(per_kp)(ix, iy, jnp.maximum(iscale, 1))
    return ori, valid & inside


@functools.partial(jax.jit, static_argnames=("upright",))
def _descriptors(sat, kx, ky, kscale, kori, valid, upright: bool = False):
    """64-dim SURF descriptor (surf.cc:667-736), batched."""
    H = sat.shape[0] - 1
    W = sat.shape[1] - 1
    iscale = jnp.maximum(kscale.astype(jnp.int32), 1)
    spacing = (15 * iscale + 1).astype(jnp.float32)
    inside = ((kx >= spacing) & (ky >= spacing)
              & (kx + spacing < W) & (ky + spacing <= H))

    grid = jnp.arange(-10, 10, dtype=jnp.float32)
    GX, GY = jnp.meshgrid(grid, grid, indexing="xy")  # (20, 20)
    cell = ((GY + 10) // 5 * 4 + (GX + 10) // 5).astype(jnp.int32)  # (20,20) in 0..15
    gauss = jnp.exp(-(GX * GX + GY * GY) / (2.0 * 3.3) ** 2)

    def per_kp(x1, y1, s1, o1):
        sin_o = jnp.where(upright, 0.0, jnp.sin(o1))
        cos_o = jnp.where(upright, 1.0, jnp.cos(o1))
        rx = jnp.round(x1 + (cos_o * (GX + 0.5) - sin_o * (GY + 0.5)) * s1).astype(jnp.int32)
        ry = jnp.round(y1 + (sin_o * (GX + 0.5) + cos_o * (GY + 0.5)) * s1).astype(jnp.int32)
        dx, dy = _haar(sat, rx.reshape(-1), ry.reshape(-1), s1, H, W)
        dx = dx.reshape(20, 20)
        dy = dy.reshape(20, 20)
        odx = cos_o * dx + sin_o * dy
        ody = -sin_o * dx + cos_o * dy
        wdx = gauss * odx
        wdy = gauss * ody
        feats = jnp.stack([wdx, wdy, jnp.abs(wdx), jnp.abs(wdy)], axis=-1)  # (20,20,4)
        flat_cell = cell.reshape(-1)
        desc = jax.ops.segment_sum(feats.reshape(-1, 4), flat_cell, num_segments=16)
        desc = desc.reshape(64)
        nrm = jnp.linalg.norm(desc)
        ok = nrm > 1e-4
        return desc / jnp.maximum(nrm, 1e-12), ok

    desc, ok = jax.vmap(per_kp)(kx, ky, iscale, kori)
    return desc, valid & inside & ok


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _pow2(n: int, minimum: int = 256) -> int:
    size = minimum
    while size < n:
        size *= 2
    return size


@functools.partial(jax.jit, static_argnames=("octave", "H", "W", "cap",
                                             "contrast_thr"))
def _octave_full(sat, octave: int, H: int, W: int, cap: int,
                 contrast_thr: float):
    """One SURF octave WITHOUT host round trips: response maps -> NMS ->
    top-`cap` candidates -> localization -> device compaction. The
    per-view driver synced to the host ~6 times per octave (2s/image
    over the remote tunnel); this is one dispatch per octave and the
    batch path vmaps it over all views.

    Returns (x, y, scale, keep) padded to cap, strongest-first."""
    step = 2 ** octave
    oh = (H + step - 1) // step
    ow = (W + step - 1) // step
    resp = jnp.stack([_response_map(sat, octave, s, H, W)
                      for s in range(4)])
    mask = _nms_mask(resp)                                   # (2, oh, ow)
    strength = jnp.where(mask, resp[1:3], -jnp.inf)
    flat = strength.reshape(-1)
    k = min(cap, flat.shape[0])
    vals, idx = jax.lax.top_k(flat, k)
    valid = vals > -jnp.inf
    si = (idx // (oh * ow)).astype(jnp.int32) + 1
    rem = idx % (oh * ow)
    iy = (rem // ow).astype(jnp.int32)
    ix = (rem % ow).astype(jnp.int32)
    ix = jnp.where(valid, ix, 2)
    iy = jnp.where(valid, iy, 2)
    isamp = jnp.where(valid, si, 1)
    fx, fy, fs_, keep = _localize(resp, ix, iy, isamp, valid, contrast_thr)
    sampling = float(step)
    x_img = (ix.astype(jnp.float32) + fx) * sampling
    y_img = (iy.astype(jnp.float32) + fy) * sampling
    samp_f = isamp.astype(jnp.float32) + fs_
    in_img = ((x_img >= 0) & (x_img + 1 <= W)
              & (y_img >= 0) & (y_img + 1 <= H))
    keep = keep & in_img & valid
    samp_round = jnp.clip(jnp.round(samp_f), 0, 3).astype(jnp.int32)
    ksizes = jnp.asarray(KERNEL_SIZES[octave], jnp.float32)[samp_round]
    scales = 3.0 * ksizes * 1.2 / 9.0
    # Compact (stable argsort on validity keeps strongest-first order;
    # slots are already capped).
    if k < cap:
        pad = cap - k
        x_img = jnp.pad(x_img, (0, pad))
        y_img = jnp.pad(y_img, (0, pad))
        scales = jnp.pad(scales, (0, pad), constant_values=1.0)
        keep = jnp.pad(keep, (0, pad))
    # Keep cap//4 slots for the orientation/descriptor stages: the
    # localization survivor count runs ~7x below the detect cap, and the
    # stable argsort keeps strongest-first so any overflow drops the
    # weakest (same budget trick as sift._compact_keypoints).
    out_cap = max(cap // 4, 256)
    order = jnp.argsort(~keep, stable=True)[:out_cap]
    kx = x_img[order]
    ky = y_img[order]
    ks = scales[order]
    kv = keep[order]
    kx = jnp.where(kv, kx, W / 2.0)
    ky = jnp.where(kv, ky, H / 2.0)
    ks = jnp.where(kv, ks, 1.0)
    return kx, ky, ks, kv


def _gray_u8(image) -> np.ndarray:
    """Pure-numpy grayscale (lightness mode, the reference feeds SURF
    byte images); eager-jnp conversions cost tunnel round trips."""
    img = np.asarray(image)
    if img.ndim == 3 and img.shape[2] >= 3:
        f = image_tools.to_float(img)
        gray = 0.5 * (np.maximum(np.maximum(f[:, :, 0], f[:, :, 1]), f[:, :, 2])
                      + np.minimum(np.minimum(f[:, :, 0], f[:, :, 1]), f[:, :, 2]))
        return (gray * 255.0 + 0.5).astype(np.uint8)
    if img.dtype == np.uint8:
        return img if img.ndim == 2 else img[:, :, 0]
    return (image_tools.to_float(img)[:, :, 0] * 255.0 + 0.5).astype(np.uint8)


_MAX_SURF_BATCH = 10  # views per vmapped dispatch (bounds HBM + keeps
# one compiled shape for any scene size; matches sift._MAX_FEATURE_BATCH)


def detect_and_describe_batch(images, options: SurfOptions = SurfOptions()):
    """SURF over a batch of SAME-SHAPE images, one vmapped dispatch
    chain per octave (the SIFT batch pattern). Larger batches process in
    sub-batches of _MAX_SURF_BATCH (the last padded by repetition).
    Returns [SurfResult]."""
    if len(images) > _MAX_SURF_BATCH:
        out = []
        for i in range(0, len(images), _MAX_SURF_BATCH):
            sub = list(images[i:i + _MAX_SURF_BATCH])
            n_real = len(sub)
            if n_real < _MAX_SURF_BATCH:
                sub += [sub[-1]] * (_MAX_SURF_BATCH - n_real)
            out.extend(detect_and_describe_batch(sub, options)[:n_real])
        return out
    grays = [_gray_u8(im) for im in images]
    if len(set(g.shape for g in grays)) != 1:
        return [detect_and_describe(im, options) for im in images]
    B = len(grays)
    H, W = grays[0].shape
    sat = jax.vmap(_build_sat)(jnp.asarray(np.stack(grays)))

    pending = []
    for octave in range(4):
        step = 2 ** octave
        oh, ow = (H + step - 1) // step, (W + step - 1) // step
        if oh < 8 or ow < 8:
            break
        cap = min(_pow2(options.max_keypoints_per_octave),
                  _pow2(max(256, 2 * oh * ow // 64)))
        det = jax.vmap(lambda s: _octave_full(
            s, octave, H, W, cap, options.contrast_threshold))(sat)
        kx, ky, ks, kv = det
        if options.use_upright_descriptor:
            ori = jnp.zeros_like(kx)
            ov = kv
        else:
            ori, ov = jax.vmap(_orientations)(sat, kx, ky, ks, kv)
        desc, ok = jax.vmap(lambda s, x, y, sc, o, v: _descriptors(
            s, x, y, sc, o, v, upright=options.use_upright_descriptor))(
                sat, kx, ky, ks, ori, ov)
        pending.append((kx, ky, ks, ori, desc, ok))

    results = [dict(x=[], y=[], scale=[], ori=[], desc=[])
               for _ in range(B)]
    for kx, ky, ks, ori, desc, ok in pending:
        ok_np = np.asarray(ok)
        kx, ky, ks = np.asarray(kx), np.asarray(ky), np.asarray(ks)
        ori, desc = np.asarray(ori), np.asarray(desc)
        for b in range(B):
            sel = ok_np[b]
            if not sel.any():
                continue
            results[b]["x"].append(kx[b][sel])
            results[b]["y"].append(ky[b][sel])
            results[b]["scale"].append(ks[b][sel])
            results[b]["ori"].append(ori[b][sel])
            results[b]["desc"].append(desc[b][sel])
    out = []
    for r in results:
        if r["x"]:
            out.append(SurfResult(
                np.concatenate(r["x"]).astype(np.float32),
                np.concatenate(r["y"]).astype(np.float32),
                np.concatenate(r["scale"]).astype(np.float32),
                np.concatenate(r["ori"]).astype(np.float32),
                np.concatenate(r["desc"]).astype(np.float32)))
        else:
            out.append(SurfResult(
                np.zeros(0, np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.float32), np.zeros(0, np.float32),
                np.zeros((0, 64), np.float32)))
    return out


def detect_and_describe(image, options: SurfOptions = SurfOptions()) -> SurfResult:
    """Run SURF on one image (Surf::process equivalent, surf.cc:49)."""
    img = np.asarray(image)
    if img.ndim == 3 and img.shape[2] >= 3:
        f = image_tools.to_float(img)
        gray = np.asarray(image_tools.desaturate(f, "lightness"))[:, :, 0]
        gray_u8 = (gray * 255.0 + 0.5).astype(np.uint8)
    elif img.dtype == np.uint8:
        gray_u8 = img if img.ndim == 2 else img[:, :, 0]
    else:
        gray_u8 = (image_tools.to_float(img)[:, :, 0] * 255.0 + 0.5).astype(np.uint8)

    H, W = gray_u8.shape
    sat = _build_sat(jnp.asarray(gray_u8))

    all_x, all_y, all_scale, all_ori, all_desc = [], [], [], [], []
    for octave in range(4):
        step = 2 ** octave
        oh = (H + step - 1) // step
        ow = (W + step - 1) // step
        if oh < 8 or ow < 8:
            break
        resp = jnp.stack([
            _response_map(sat, octave, s, H, W) for s in range(4)])
        mask = np.asarray(_nms_mask(resp))
        si, yy, xx = np.nonzero(mask)
        si = si + 1  # middle samples 1..2
        n = len(xx)
        if n == 0:
            continue
        if n > options.max_keypoints_per_octave:
            resp_np = np.asarray(resp)
            vals = resp_np[si, yy, xx]
            top = np.argpartition(-vals, options.max_keypoints_per_octave)[: options.max_keypoints_per_octave]
            si, yy, xx = si[top], yy[top], xx[top]
            n = len(xx)
        npad = 256
        while npad < n:
            npad *= 2
        pad = npad - n
        ix = jnp.asarray(np.pad(xx.astype(np.int32), (0, pad), constant_values=2))
        iy = jnp.asarray(np.pad(yy.astype(np.int32), (0, pad), constant_values=2))
        isamp = jnp.asarray(np.pad(si.astype(np.int32), (0, pad), constant_values=1))
        valid = jnp.asarray(np.arange(npad) < n)
        fx, fy, fs_, keep = _localize(resp, ix, iy, isamp, valid,
                                      options.contrast_threshold)
        keep_np = np.asarray(keep)
        if not keep_np.any():
            continue
        sampling = float(2 ** octave)
        x_img = (np.asarray(ix) + np.asarray(fx))[keep_np] * sampling
        y_img = (np.asarray(iy) + np.asarray(fy))[keep_np] * sampling
        samp_f = (np.asarray(isamp) + np.asarray(fs_))[keep_np]
        in_img = (x_img >= 0) & (x_img + 1 <= W) & (y_img >= 0) & (y_img + 1 <= H)
        x_img, y_img, samp_f = x_img[in_img], y_img[in_img], samp_f[in_img]
        n2 = len(x_img)
        if n2 == 0:
            continue
        # Scale from filter size (surf.cc:497-501).
        samp_round = np.clip(np.round(samp_f).astype(int), 0, 3)
        ksizes = np.array(KERNEL_SIZES[octave])[samp_round]
        scales = 3.0 * ksizes * 1.2 / 9.0

        npad2 = 256
        while npad2 < n2:
            npad2 *= 2
        pad2 = npad2 - n2
        kx = jnp.asarray(np.pad(x_img.astype(np.float32), (0, pad2), constant_values=W / 2))
        ky = jnp.asarray(np.pad(y_img.astype(np.float32), (0, pad2), constant_values=H / 2))
        ks = jnp.asarray(np.pad(scales.astype(np.float32), (0, pad2), constant_values=1.0))
        kvalid = jnp.asarray(np.arange(npad2) < n2)
        if options.use_upright_descriptor:
            ori = jnp.zeros(npad2, jnp.float32)
            ori_valid = kvalid
        else:
            ori, ori_valid = _orientations(sat, kx, ky, ks, kvalid)
        desc, ok = _descriptors(sat, kx, ky, ks, ori, ori_valid,
                                upright=options.use_upright_descriptor)
        ok_np = np.asarray(ok)
        if not ok_np.any():
            continue
        all_x.append(np.asarray(kx)[ok_np])
        all_y.append(np.asarray(ky)[ok_np])
        all_scale.append(np.asarray(ks)[ok_np])
        all_ori.append(np.asarray(ori)[ok_np])
        all_desc.append(np.asarray(desc)[ok_np])

    if not all_x:
        return SurfResult(np.zeros(0, np.float32), np.zeros(0, np.float32),
                          np.zeros(0, np.float32), np.zeros(0, np.float32),
                          np.zeros((0, 64), np.float32))
    return SurfResult(
        np.concatenate(all_x).astype(np.float32),
        np.concatenate(all_y).astype(np.float32),
        np.concatenate(all_scale).astype(np.float32),
        np.concatenate(all_ori).astype(np.float32),
        np.concatenate(all_desc).astype(np.float32),
    )
