"""Epipolar geometry: 8-point/N-point fundamental, essential decomposition,
Sampson distance (reference: libs/sfm/fundamental.h/.cc).

Everything is batched over a leading hypothesis dimension so RANSAC can
evaluate all samples in parallel on device: the 8-point solve becomes one
batched SVD over (B, 8, 9) systems, scoring one (B, N) Sampson evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _correspondence_matrix(p1, p2):
    """Rows of the DLT system for x2^T F x1 = 0.

    p1, p2: (..., N, 2). Returns (..., N, 9) with the reference's column
    order (fundamental.cc:52-64)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )


def fundamental_8_point(p1, p2):
    """Batched 8-point algorithm. p1, p2: (..., 8, 2) -> F (..., 3, 3).

    Solution is the right-singular vector of the smallest singular value
    (fundamental.cc:80-117); rank-2 is NOT enforced here, call
    enforce_fundamental_constraints (same split as the reference).
    """
    A = _correspondence_matrix(p1, p2)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    f = vt[..., -1, :]
    return f.reshape(f.shape[:-1] + (3, 3))


def fundamental_least_squares(p1, p2):
    """N-point least squares fundamental (fundamental.cc:43-77)."""
    return fundamental_8_point(p1, p2)


def fundamental_7_point(p1, p2):
    """Batched 7-point algorithm (fundamental.h 7-point; homography.cc).

    p1, p2: (..., 7, 2). The null space is spanned by F1, F2; roots of
    the cubic det(a F1 + (1-a) F2) = 0 give up to three F candidates.
    Returns (Fs (..., 3, 3, 3), valid (..., 3)) — invalid roots are
    complex/spurious and flagged false.
    """
    A = _correspondence_matrix(p1, p2)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    f1 = vt[..., -1, :].reshape(vt.shape[:-2] + (3, 3))
    f2 = vt[..., -2, :].reshape(vt.shape[:-2] + (3, 3))

    # det(a f1 + (1 - a) f2) is cubic in a; sample at 4 points to get the
    # coefficients exactly (cubic interpolation through a = 0, 1, 2, -1).
    def det_at(a):
        return jnp.linalg.det(a * f1 + (1.0 - a) * f2)

    d0 = det_at(0.0)   # c0
    d1 = det_at(1.0)   # c3+c2+c1+c0
    d2 = det_at(2.0)   # 8c3+4c2+2c1+c0
    dm = det_at(-1.0)  # -c3+c2-c1+c0
    c0 = d0
    c2 = (d1 + dm) / 2.0 - c0
    c3 = (d2 - 2.0 * d1 + c0 - 2.0 * c2) / 6.0
    c1 = d1 - c0 - c2 - c3
    # Real roots of c3 a^3 + c2 a^2 + c1 a + c0 (pure real arithmetic).
    from .p3p import cubic_roots_real

    c3_safe = jnp.where(jnp.abs(c3) < 1e-20, 1e-20, c3)
    a, valid = cubic_roots_real(c2 / c3_safe, c1 / c3_safe, c0 / c3_safe)
    Fs = (a[..., None, None] * f1[..., None, :, :]
          + (1.0 - a)[..., None, None] * f2[..., None, :, :])
    return Fs, valid


def enforce_fundamental_constraints(F):
    """Zero the smallest singular value (fundamental.cc:113-126)."""
    u, s, vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    return u @ (s[..., :, None] * vt)


def enforce_essential_constraints(E):
    """diag(s, s, 0) with s the mean of the two largest singular values
    (fundamental.cc:128-145)."""
    u, s, vt = jnp.linalg.svd(E)
    avg = (s[..., 0] + s[..., 1]) * 0.5
    s = jnp.stack([avg, avg, jnp.zeros_like(avg)], axis=-1)
    return u @ (s[..., :, None] * vt)


def pose_from_essential(E):
    """Four (R, t) decompositions of E (fundamental.cc:147-193).

    Returns (Rs (..., 4, 3, 3), ts (..., 4, 3)); camera 1 is [I|0].
    """
    u, _, vt = jnp.linalg.svd(E)
    # det(R) = +1 fixups.
    du = jnp.linalg.det(u)
    dv = jnp.linalg.det(vt)
    u = u.at[..., :, 2].multiply(jnp.where(du < 0, -1.0, 1.0)[..., None])
    vt = vt.at[..., 2, :].multiply(jnp.where(dv < 0, -1.0, 1.0)[..., None])
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def sampson_distance(F, p1, p2):
    """Batched Sampson distance (fundamental.cc:225-247).

    F: (..., 3, 3); p1, p2: (..., N, 2). Returns (..., N).
    """
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], axis=-1)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, x1)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, x2)
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-30)


def fundamental_from_pose(pose1, pose2) -> np.ndarray:
    """F from two camera poses: F = [e2]x P2 P1^+ (fundamental.cc:196-223)."""
    P1 = pose1.fill_p_matrix()
    P2 = pose2.fill_p_matrix()
    c1 = np.concatenate([pose1.R.T @ -pose1.t, [1.0]])
    e2 = P2 @ c1
    ex = np.array([[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]], [-e2[1], e2[0], 0]])
    return ex @ P2 @ np.linalg.pinv(P1)
