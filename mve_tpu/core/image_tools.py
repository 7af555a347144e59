"""Image operations: rescale, blur, undistort, color (libs/mve/image_tools.h).

All functions operate on (H, W, C) float32 arrays and are jnp-traceable
(jit/vmap-compatible) so they run on TPU; host callers can pass numpy.
Behaviors match the reference:

- rescale_half_size: 2x2 box average, odd sizes keep the last row/col
  (image_tools.h:577-614).
- rescale_half_size_gaussian: 4x4 gaussian taps at even offsets with
  weights exp(-{0.5,2.5,4.5}/2sigma^2), default sigma ~1 /
  sqrt(2)*... (image_tools.h:619-...); we use the same three-weight
  stencil.
- blur_gaussian: separable convolution, kernel size ceil(sigma*2.884)*2+1
  (image_tools.h blur_gaussian).
- undistortion models: MSPS, MVE/bundler k2k4, VisualSFM
  (image_tools.h:106-139).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def to_float(img):
    """uint8/uint16 -> [0,1] float32 (image_tools byte_to_float_image)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32)


def to_byte(img):
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# rescaling
# ---------------------------------------------------------------------------

def rescale_half_size(img):
    """2x2 average downsample; odd dims replicate the last row/column."""
    img = jnp.asarray(img)
    h, w = img.shape[0], img.shape[1]
    # Pad to even with edge replication (matches the reference's
    # "hasnext" handling, image_tools.h:600-607).
    img = jnp.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2])


def rescale_half_size_subsample(img):
    """Half-size by taking every second pixel (image_tools.h:695-718);
    output dims are ceil(w/2) x ceil(h/2). Lossless for images produced by
    rescale_double_size_supersample; used for COLMAP depth-map rescaling."""
    img = jnp.asarray(img)
    return img[0::2, 0::2]


def rescale_half_size_gaussian(img, sigma: float = math.sqrt(1.0)):
    """Gaussian 4x4-tap half-size (image_tools.h:619).

    Output pixel (x,y) gathers input pixels at {2x-1, 2x, 2x+1, 2x+2} x
    {2y-1, 2y, 2y+1, 2y+2} with weights w1 (4 center), w2 (8 edge),
    w3 (4 corner), normalized.
    """
    img = jnp.asarray(img)
    h, w = img.shape[0], img.shape[1]
    w1 = math.exp(-0.5 / (2.0 * sigma**2))
    w2 = math.exp(-2.5 / (2.0 * sigma**2))
    w3 = math.exp(-4.5 / (2.0 * sigma**2))
    # Build the separable [w?, ...] stencil: weights along one axis are
    # [a, b, b, a] with a*a=w3, a*b=w2, b*b=w1 — the 2D stencil is the
    # outer product, so use a = sqrt(w3), b = sqrt(w1).
    a = math.sqrt(w3)
    b = math.sqrt(w1)
    kern = jnp.array([a, b, b, a], jnp.float32)
    kern = kern / jnp.sum(kern)
    padded = jnp.pad(img, ((1, 2 + h % 2), (1, 2 + w % 2), (0, 0)), mode="edge")
    # Gather 4 rows/cols per output pixel via strided slices.
    oh = (h + 1) // 2
    ow = (w + 1) // 2
    acc = jnp.zeros((oh, ow, img.shape[2]), img.dtype)
    for dy in range(4):
        rowsel = padded[dy : dy + 2 * oh : 2]
        inner = jnp.zeros_like(acc)
        for dx in range(4):
            inner = inner + kern[dx] * rowsel[:, dx : dx + 2 * ow : 2]
        acc = acc + kern[dy] * inner
    return acc


def rescale_double_size(img):
    """2x nearest/bilinear upsample (image_tools.h:734)."""
    img = jnp.asarray(img)
    h, w, c = img.shape
    out = jax.image.resize(img, (h * 2, w * 2, c), method="linear")
    return out


def rescale_double_size_supersample(img):
    """2x upscale keeping every second row/column exact
    (image_tools.h:214-223): even output pixels copy the input, odd ones
    linearly interpolate — a half-pixel shift toward the upper left.
    Inverse of rescale_half_size_subsample."""
    img = jnp.asarray(img)
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
    h, w = img.shape[0], img.shape[1]
    out_shape = (2 * h, 2 * w) + img.shape[2:]
    out = jnp.zeros(out_shape, img.dtype)
    out = out.at[0::2, 0::2].set(img)
    out = out.at[0::2, 1::2].set((img + right) / 2)
    out = out.at[1::2, 0::2].set((img + down) / 2)
    out = out.at[1::2, 1::2].set((img + right + down + down_right) / 4)
    return out


def resize(img, new_h: int, new_w: int, method: str = "linear"):
    """General rescale (image_tools.h rescale_image nearest/linear)."""
    img = jnp.asarray(img)
    return jax.image.resize(img, (new_h, new_w, img.shape[2]), method=method)


# ---------------------------------------------------------------------------
# blurring
# ---------------------------------------------------------------------------

def create_thumbnail(img, thumb_width: int = 50, thumb_height: int = 50):
    """Aspect-filling thumbnail: linear rescale to cover the thumb dims,
    then center crop (image_tools.h:1659-1690 create_thumbnail)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    h, w = img.shape[:2]
    image_aspect = w / h
    thumb_aspect = thumb_width / thumb_height
    if image_aspect > thumb_aspect:
        rw, rh = int(math.ceil(thumb_height * image_aspect)), thumb_height
        cl, ct = (rw - thumb_width) // 2, 0
    else:
        rw, rh = thumb_width, int(math.ceil(thumb_width / image_aspect))
        cl, ct = 0, (rh - thumb_height) // 2
    dtype = img.dtype
    small = np.asarray(resize(img.astype(np.float32), rh, rw, "linear"))
    out = small[ct:ct + thumb_height, cl:cl + thumb_width]
    if np.issubdtype(dtype, np.integer):
        out = np.clip(np.rint(out), np.iinfo(dtype).min, np.iinfo(dtype).max)
    return out.astype(dtype)


def _gauss_kernel_1d(sigma: float):
    ks = int(math.ceil(sigma * 2.884)) * 2 + 1  # image_tools blur_gaussian
    x = np.arange(ks) - ks // 2
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sigma",))
def blur_gaussian(img, sigma: float):
    """Separable gaussian blur with reflect ("symmetric") boundary."""
    if sigma <= 0:
        return jnp.asarray(img)
    img = jnp.asarray(img)
    k = jnp.asarray(_gauss_kernel_1d(sigma))
    r = len(k) // 2
    # (H, W, C) -> conv along H then W, per channel, via depthwise conv.
    x = jnp.pad(img, ((r, r), (0, 0), (0, 0)), mode="edge")
    x = jnp.moveaxis(x, -1, 0)[:, None]  # (C, 1, H+2r, W)
    kh = k.reshape(1, 1, -1, 1)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jnp.moveaxis(x[:, 0], 0, -1)
    x = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="edge")
    x = jnp.moveaxis(x, -1, 0)[:, None]
    kw = k.reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return jnp.moveaxis(x[:, 0], 0, -1)


def blur_boxfilter(img, ks: int):
    """Iterated box filter approximation (image_tools blur_boxfilter)."""
    img = jnp.asarray(img)
    size = 2 * ks + 1
    k = jnp.ones(size, jnp.float32) / size
    x = jnp.pad(img, ((ks, ks), (ks, ks), (0, 0)), mode="edge")
    x = jnp.moveaxis(x, -1, 0)[:, None]
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, -1, 1), (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, 1, -1), (1, 1), "VALID")
    return jnp.moveaxis(x[:, 0], 0, -1)


# ---------------------------------------------------------------------------
# sampling / warping
# ---------------------------------------------------------------------------

def bilinear_sample(img, xy, fill=0.0):
    """Sample (H,W,C) image at continuous pixel coords xy (..., 2).

    Coordinates follow the reference convention: pixel centers at integer
    coordinates after the -0.5 shift has been applied by the caller.
    Out-of-bounds samples return `fill`.
    """
    img = jnp.asarray(img)
    h, w = img.shape[0], img.shape[1]
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    val = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    inside = ((x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1))[..., None]
    return jnp.where(inside, val, fill)


# ---------------------------------------------------------------------------
# undistortion (image_tools.h:106-139)
# ---------------------------------------------------------------------------

def _undistort_common(img, rd_func):
    """Warp so that output pixel p samples input at p * rd(p)."""
    img = jnp.asarray(img)
    h, w = img.shape[0], img.shape[1]
    fw, fh = float(w), float(h)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # Center-relative coordinates in pixel units (pixel centers at +0.5).
    cx = (xs + 0.5) - fw / 2.0
    cy = (ys + 0.5) - fh / 2.0
    factor = rd_func(cx, cy, fw, fh)
    sx = cx * factor + fw / 2.0 - 0.5
    sy = cy * factor + fh / 2.0 - 0.5
    return bilinear_sample(img, jnp.stack([sx, sy], axis=-1))


def image_undistort_k2k4_batch(imgs, flen, k2, k4):
    """Batched k2/k4 undistortion: ONE fused device program for a whole
    stack of same-shape views (sfmrecon.cc:403-444 is the reference's
    OpenMP per-view loop; here the batch IS the parallel axis).

    imgs: (B, H, W, C) uint8 (converted to float on device, halving the
    host->device traffic) or float; flen/k2/k4: (B,) per-view params.
    Returns (B, H, W, C) uint8.
    """
    imgs = jnp.asarray(imgs)
    return _undistort_k2k4_batch_impl(
        imgs, jnp.asarray(flen, jnp.float32), jnp.asarray(k2, jnp.float32),
        jnp.asarray(k4, jnp.float32))


@jax.jit
def _undistort_k2k4_batch_impl(imgs, flen, k2, k4):
    f = imgs.astype(jnp.float32)
    if imgs.dtype == jnp.uint8:
        f = f / 255.0

    def one(img, fl, a2, a4):
        h, w = img.shape[0], img.shape[1]
        fw, fh = float(w), float(h)
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        cx = (xs + 0.5) - fw / 2.0
        cy = (ys + 0.5) - fh / 2.0
        norm = fl * jnp.maximum(fw, fh)
        r2 = (cx * cx + cy * cy) / (norm * norm)
        factor = 1.0 + a2 * r2 + a4 * r2 * r2
        sx = cx * factor + fw / 2.0 - 0.5
        sy = cy * factor + fh / 2.0 - 0.5
        return bilinear_sample(img, jnp.stack([sx, sy], axis=-1))

    out = jax.vmap(one)(f, flen, k2, k4)
    return jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)


def image_undistort_k2k4(img, focal_length: float, k2: float, k4: float):
    """MVE/bundler model: rd(r) = 1 + k2 r^2 + k4 r^4 with r in unit
    normalized coordinates (divided by flen * max_dim)."""
    if k2 == 0.0 and k4 == 0.0:
        return jnp.asarray(img)

    def rd(cx, cy, fw, fh):
        norm = focal_length * jnp.maximum(fw, fh)
        r2 = (cx * cx + cy * cy) / (norm * norm)
        return 1.0 + k2 * r2 + k4 * r2 * r2

    return _undistort_common(img, rd)


def image_undistort_vsfm(img, focal_length: float, k1: float):
    """VisualSFM model (image_tools image_undistort_vsfm).

    Inverts the forward distortion rd = 1 + k1 r^2 per pixel by solving
    the cubic for the distorted radius (closed-form as in VisualSFM)."""
    if k1 == 0.0:
        return jnp.asarray(img)

    def rd(cx, cy, fw, fh):
        norm = focal_length * jnp.maximum(fw, fh)
        # squared undistorted radius in normalized coords
        r2 = (cx * cx + cy * cy) / (norm * norm)
        # Solve t (1 + k1 t^2)^2 = r2 for distorted-radius scaling via a
        # few Newton steps (robust for |k1 r2| < ~0.5).
        t = r2
        for _ in range(6):
            f = t * (1.0 + k1 * t) ** 2 - r2
            df = (1.0 + k1 * t) * (1.0 + 3.0 * k1 * t)
            t = t - f / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
        # factor maps undistorted -> distorted radius
        safe = r2 > 1e-20
        return jnp.where(safe, jnp.sqrt(jnp.maximum(t, 0.0) / jnp.maximum(r2, 1e-20)), 1.0)

    return _undistort_common(img, rd)


def image_undistort_msps(img, k0: float, k1: float):
    """Photosynther model (image_tools image_undistort_msps)."""
    if k0 == k1:
        return jnp.asarray(img)

    def rd(cx, cy, fw, fh):
        maxdim = jnp.maximum(fw, fh)
        r2 = (cx * cx + cy * cy) / (maxdim * maxdim / 4.0)
        return 1.0 + (k0 + k1 * r2) * r2

    return _undistort_common(img, rd)


# ---------------------------------------------------------------------------
# misc (desaturate, gamma, crop, rotate, flip)
# ---------------------------------------------------------------------------

def desaturate(img, mode: str = "luminosity"):
    """RGB -> gray (image_tools desaturate; LUMINOSITY/LIGHTNESS/AVERAGE)."""
    img = jnp.asarray(img)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    if mode == "luminosity":
        gray = 0.21 * r + 0.72 * g + 0.07 * b
    elif mode == "luminance":
        gray = 0.30 * r + 0.59 * g + 0.11 * b
    elif mode == "lightness":
        gray = 0.5 * (jnp.maximum(jnp.maximum(r, g), b) + jnp.minimum(jnp.minimum(r, g), b))
    elif mode == "average":
        gray = (r + g + b) / 3.0
    else:
        raise ValueError(f"unknown desaturate mode {mode}")
    return gray[..., None]


def gamma_correct(img, power: float):
    return jnp.power(jnp.maximum(jnp.asarray(img), 0.0), power)


def crop(img, x: int, y: int, w: int, h: int):
    return jnp.asarray(img)[y : y + h, x : x + w]


def rotate90(img, ccw: bool = False):
    return jnp.rot90(jnp.asarray(img), k=1 if ccw else -1, axes=(0, 1))


def flip(img, horizontal: bool = False, vertical: bool = False):
    img = jnp.asarray(img)
    if horizontal:
        img = img[:, ::-1]
    if vertical:
        img = img[::-1]
    return img
