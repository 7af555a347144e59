"""Color space conversions (reference: libs/mve/image_color.h).

sRGB <-> linear, RGB <-> XYZ (D65), XYZ <-> Lab, RGB <-> YCbCr — the set
the reference provides. All functions are jnp-traceable over (..., 3)
arrays in [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp

# sRGB D65 primaries.
_RGB_TO_XYZ = jnp.array([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
])
_XYZ_TO_RGB = jnp.array([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252],
])
_D65 = jnp.array([0.95047, 1.0, 1.08883])


def srgb_to_linear(c):
    c = jnp.asarray(c)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    c = jnp.asarray(c)
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1 / 2.4) - 0.055)


def rgb_to_xyz(rgb):
    return jnp.einsum("ij,...j->...i", _RGB_TO_XYZ, jnp.asarray(rgb))


def xyz_to_rgb(xyz):
    return jnp.einsum("ij,...j->...i", _XYZ_TO_RGB, jnp.asarray(xyz))


def _lab_f(t):
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _lab_finv(t):
    d = 6.0 / 29.0
    return jnp.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))


def xyz_to_lab(xyz):
    xyz = jnp.asarray(xyz) / _D65
    fx, fy, fz = _lab_f(xyz[..., 0]), _lab_f(xyz[..., 1]), _lab_f(xyz[..., 2])
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_xyz(lab):
    lab = jnp.asarray(lab)
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = fy + lab[..., 1] / 500.0
    fz = fy - lab[..., 2] / 200.0
    return jnp.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-1) * _D65


def rgb_to_ycbcr(rgb):
    rgb = jnp.asarray(rgb)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 0.5 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 0.5 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc):
    ycc = jnp.asarray(ycc)
    y = ycc[..., 0]
    cb = ycc[..., 1] - 0.5
    cr = ycc[..., 2] - 0.5
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)
