"""Rotation parameterizations: Rodrigues/axis-angle, quaternions.

Reference behavior: libs/math/matrix_tools.h (rotation_from_axis_angle),
libs/math/quaternion.h, and the Rodrigues-vector camera update used by
bundle adjustment (libs/sfm/bundle_adjustment.cc:662-688).

All functions are jnp-traceable and batched over leading dimensions where
noted. Inputs can be numpy or jax arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _xp(*arrays):
    """numpy on host inputs, jnp under tracing / for device arrays —
    host camera bookkeeping must not trigger device dispatches."""
    for a in arrays:
        if isinstance(a, jax.Array) or isinstance(a, jax.core.Tracer):
            return jnp
    return np


def rodrigues_to_matrix(r):
    """Axis-angle (Rodrigues) 3-vector -> 3x3 rotation matrix.

    R = I + sin(a)/a [r]_x + (1-cos(a))/a^2 [r]_x^2 with a = |r|.
    Uses a Taylor-safe formulation so the derivative at r=0 is exact
    (needed because BA linearizes around r=0 every LM step, matching the
    reference's incremental Rodrigues update at bundle_adjustment.cc:662).

    Batched over leading dims: (..., 3) -> (..., 3, 3).
    """
    xp = _xp(r)
    r = xp.asarray(r)
    a2 = xp.sum(r * r, axis=-1)  # angle^2
    a = xp.sqrt(xp.maximum(a2, 1e-32))
    # sin(a)/a and (1-cos(a))/a^2 with series fallback near 0.
    small = a2 < 1e-12
    sinc = xp.where(small, 1.0 - a2 / 6.0, xp.sin(a) / a)
    cosc = xp.where(small, 0.5 - a2 / 24.0, (1.0 - xp.cos(a)) / xp.maximum(a2, 1e-32))

    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    zero = xp.zeros_like(rx)
    K = xp.stack(
        [
            xp.stack([zero, -rz, ry], axis=-1),
            xp.stack([rz, zero, -rx], axis=-1),
            xp.stack([-ry, rx, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = xp.broadcast_to(xp.eye(3, dtype=K.dtype), K.shape)
    return eye + sinc[..., None, None] * K + cosc[..., None, None] * (K @ K)


def matrix_to_rodrigues(R):
    """3x3 rotation matrix -> axis-angle 3-vector. Batched (..., 3, 3).

    Goes through the quaternion representation (robust for all angles,
    including near pi where the direct log formula degenerates):
    angle = 2 atan2(|v|, w), axis = v/|v| for q = (w, v).
    """
    q = matrix_to_quat(R)
    xp = _xp(q)
    w = xp.abs(q[..., 0])
    v = q[..., 1:] * xp.sign(q[..., :1] + 1e-300)  # force w >= 0 hemisphere
    vn = xp.linalg.norm(v, axis=-1)
    angle = 2.0 * xp.arctan2(vn, w)
    # angle/vn with series expansion near 0: 2/w * (1 + vn^2/(3 w^2) ...)
    small = vn < 1e-6
    scale = xp.where(small, 2.0 / xp.maximum(w, 1e-32), angle / xp.maximum(vn, 1e-32))
    return v * scale[..., None]


def quat_to_matrix(q):
    """Unit quaternion (w, x, y, z) -> rotation matrix. Batched (..., 4)."""
    xp = _xp(q)
    q = xp.asarray(q)
    q = q / xp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return xp.stack(
        [
            xp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            xp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            xp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R):
    """Rotation matrix -> unit quaternion (w, x, y, z). Batched (..., 3, 3).

    Uses the branch-free Shepperd-style construction (max component).
    """
    xp = _xp(R)
    R = xp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best.
    qw = xp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = xp.sqrt(xp.maximum(qw, 0.0)) * 0.5
    c0 = xp.stack([qw[..., 0], (m21 - m12) / (4 * qw[..., 0] + 1e-32), (m02 - m20) / (4 * qw[..., 0] + 1e-32), (m10 - m01) / (4 * qw[..., 0] + 1e-32)], axis=-1)
    c1 = xp.stack([(m21 - m12) / (4 * qw[..., 1] + 1e-32), qw[..., 1], (m01 + m10) / (4 * qw[..., 1] + 1e-32), (m02 + m20) / (4 * qw[..., 1] + 1e-32)], axis=-1)
    c2 = xp.stack([(m02 - m20) / (4 * qw[..., 2] + 1e-32), (m01 + m10) / (4 * qw[..., 2] + 1e-32), qw[..., 2], (m12 + m21) / (4 * qw[..., 2] + 1e-32)], axis=-1)
    c3 = xp.stack([(m10 - m01) / (4 * qw[..., 3] + 1e-32), (m02 + m20) / (4 * qw[..., 3] + 1e-32), (m12 + m21) / (4 * qw[..., 3] + 1e-32), qw[..., 3]], axis=-1)
    cands = xp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    best = xp.argmax(qw, axis=-1)
    q = xp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = q / xp.linalg.norm(q, axis=-1, keepdims=True)
    return q


def skew(v):
    """3-vector -> 3x3 skew-symmetric cross-product matrix. Batched."""
    xp = _xp(v)
    v = xp.asarray(v)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = xp.zeros_like(x)
    return xp.stack(
        [
            xp.stack([zero, -z, y], axis=-1),
            xp.stack([z, zero, -x], axis=-1),
            xp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
