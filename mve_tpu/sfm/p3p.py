"""Perspective-three-point pose, batched (reference: libs/sfm/pose_p3p.cc).

The reference uses Kneip's closed form; we use the classical Grunert
distance formulation (Haralick et al., "Analysis and Solutions of the
Three Point Perspective Pose Estimation Problem") whose resultant quartic
was re-derived symbolically (sympy) for this implementation — same
solution set, up to four (R, t) per sample, and a shape that batches
cleanly on TPU: one closed-form quartic solve (Ferrari, complex64) plus a
batched 3x3 SVD absolute-orientation step. No per-sample eigensolver, no
host round-trips, so an entire RANSAC hypothesis batch solves in one
device call.

Convention matches the reference: x_cam = R x_world + t (pose_p3p.h:41-45).
"""

from __future__ import annotations

import jax.numpy as jnp


def cubic_roots_real(B, C, D):
    """All real roots of m^3 + B m^2 + C m + D = 0, batched, pure real
    arithmetic (no complex64 — unsupported on some TPU runtimes).

    Returns (roots (..., 3), valid (..., 3)); slot 0 is always a real
    root and, in the three-real-root branch, the LARGEST one.
    """
    B = jnp.asarray(B, jnp.float32)
    p = C - B * B / 3.0
    q = 2.0 * B**3 / 27.0 - B * C / 3.0 + D
    disc = q * q / 4.0 + p**3 / 27.0

    # disc >= 0: one real root via Cardano (sign-preserving cbrt).
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    root_single = u + v

    # disc < 0: three real roots via the trigonometric form (p < 0 here).
    pm = jnp.minimum(p, -1e-30)
    rr = jnp.sqrt(-pm / 3.0)
    arg = jnp.clip(3.0 * q / (2.0 * pm) * jnp.sqrt(-3.0 / pm), -1.0, 1.0)
    phi = jnp.arccos(arg)
    t0 = 2.0 * rr * jnp.cos(phi / 3.0)                       # largest
    t1 = 2.0 * rr * jnp.cos((phi - 2.0 * jnp.pi) / 3.0)
    t2 = 2.0 * rr * jnp.cos((phi - 4.0 * jnp.pi) / 3.0)

    three = disc < 0.0
    r0 = jnp.where(three, t0, root_single)
    r1 = jnp.where(three, t1, root_single)
    r2 = jnp.where(three, t2, root_single)
    shift = B / 3.0
    roots = jnp.stack([r0 - shift, r1 - shift, r2 - shift], axis=-1)
    valid = jnp.stack([jnp.ones_like(three), three, three], axis=-1)
    return roots, valid


def solve_quartic(b, c, d, e):
    """REAL roots of x^4 + b x^3 + c x^2 + d x + e = 0 (Ferrari), batched.

    Returns (roots (..., 4), real_mask (..., 4)) in pure real arithmetic.
    """
    b = jnp.asarray(b, jnp.float32)
    p = c - 3.0 * b * b / 8.0
    q = d - b * c / 2.0 + b**3 / 8.0
    r = e - b * d / 4.0 + b * b * c / 16.0 - 3.0 * b**4 / 256.0
    # Resolvent cubic m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0 always has a
    # root m >= 0 (value at 0 is -q^2/8 <= 0); slot 0 is the largest.
    mroots, _ = cubic_roots_real(
        jnp.asarray(p, jnp.float32),
        jnp.asarray(p * p / 4.0 - r, jnp.float32),
        jnp.asarray(-q * q / 8.0, jnp.float32))
    m = jnp.maximum(mroots[..., 0], 0.0)
    alpha = jnp.sqrt(2.0 * m)
    biquad = alpha < 1e-10  # q ~ 0: biquadratic fallback

    alpha_safe = jnp.maximum(alpha, 1e-10)
    gamma1 = (p + alpha * alpha - q / alpha_safe) / 2.0
    gamma2 = (p + alpha * alpha + q / alpha_safe) / 2.0
    disc1 = alpha * alpha - 4.0 * gamma1
    disc2 = alpha * alpha - 4.0 * gamma2
    s1 = jnp.sqrt(jnp.maximum(disc1, 0.0))
    s2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
    yF = jnp.stack([(-alpha + s1) / 2.0, (-alpha - s1) / 2.0,
                    (alpha + s2) / 2.0, (alpha - s2) / 2.0], axis=-1)
    realF = jnp.stack([disc1 >= 0, disc1 >= 0, disc2 >= 0, disc2 >= 0], axis=-1)

    # Biquadratic y^4 + p y^2 + r = 0: y^2 = (-p +- sqrt(p^2-4r))/2.
    discB = p * p - 4.0 * r
    sB = jnp.sqrt(jnp.maximum(discB, 0.0))
    u1 = (-p + sB) / 2.0
    u2 = (-p - sB) / 2.0
    yB = jnp.stack([jnp.sqrt(jnp.maximum(u1, 0.0)),
                    -jnp.sqrt(jnp.maximum(u1, 0.0)),
                    jnp.sqrt(jnp.maximum(u2, 0.0)),
                    -jnp.sqrt(jnp.maximum(u2, 0.0))], axis=-1)
    realB = jnp.stack([(discB >= 0) & (u1 >= 0), (discB >= 0) & (u1 >= 0),
                       (discB >= 0) & (u2 >= 0), (discB >= 0) & (u2 >= 0)], axis=-1)

    y = jnp.where(biquad[..., None], yB, yF)
    real = jnp.where(biquad[..., None], realB, realF)
    return y - (b / 4.0)[..., None], real


def _kabsch(P, Y):
    """Rigid transform world->camera from exact 3-point correspondences.

    P: (..., 3, 3) world points (rows), Y: (..., 3, 3) camera points.
    Returns (R, t) with Y ~= R P + t, batched.
    """
    Pc = jnp.mean(P, axis=-2, keepdims=True)
    Yc = jnp.mean(Y, axis=-2, keepdims=True)
    H = jnp.einsum("...ni,...nj->...ij", P - Pc, Y - Yc)
    u, _, vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(jnp.einsum("...ji,...kj->...ik", vt, u))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    R = jnp.einsum("...ji,...j,...jk->...ik", vt, D, jnp.swapaxes(u, -1, -2))
    t = Yc[..., 0, :] - jnp.einsum("...ij,...j->...i", R, Pc[..., 0, :])
    return R, t


def pose_p3p(p_world, f_bearing):
    """Batched Grunert P3P.

    p_world: (..., 3, 3) three world points (rows).
    f_bearing: (..., 3, 3) corresponding unit bearing vectors (rows).
    Returns (Rs (..., 4, 3, 3), ts (..., 4, 3), valid (..., 4)).
    """
    P1, P2, P3 = p_world[..., 0, :], p_world[..., 1, :], p_world[..., 2, :]
    f1, f2, f3 = f_bearing[..., 0, :], f_bearing[..., 1, :], f_bearing[..., 2, :]

    # Triangle side lengths: a opposite P1 (=|P2-P3|), b opposite P2, c opp P3.
    a = jnp.linalg.norm(P2 - P3, axis=-1)
    b = jnp.linalg.norm(P1 - P3, axis=-1)
    c = jnp.linalg.norm(P1 - P2, axis=-1)
    # Cosines of the viewing angles between bearings.
    ca = jnp.sum(f2 * f3, axis=-1)  # alpha: between rays 2 and 3
    cb = jnp.sum(f1 * f3, axis=-1)  # beta: between rays 1 and 3
    cg = jnp.sum(f1 * f2, axis=-1)  # gamma: between rays 1 and 2

    b2 = jnp.maximum(b * b, 1e-20)
    A = (a * a) / b2
    C = (c * c) / b2

    # Quartic in v = s3/s1, coefficients derived symbolically from the
    # resultant of Grunert's two quadratics (see module docstring):
    a4 = A**2 - 2 * A * C - 2 * A + C**2 - 4 * C * ca**2 + 2 * C + 1
    a3 = (-4 * A**2 * cb + 8 * A * C * cb + 4 * A * ca * cg + 4 * A * cb
          - 4 * C**2 * cb + 8 * C * ca**2 * cb + 4 * C * ca * cg - 4 * C * cb
          - 4 * ca * cg)
    a2 = (4 * A**2 * cb**2 + 2 * A**2 - 8 * A * C * cb**2 - 4 * A * C
          - 8 * A * ca * cb * cg - 4 * A * cg**2 + 4 * C**2 * cb**2 + 2 * C**2
          - 4 * C * ca**2 - 8 * C * ca * cb * cg + 4 * ca**2 + 4 * cg**2 - 2)
    a1 = (-4 * A**2 * cb + 8 * A * C * cb + 4 * A * ca * cg
          + 8 * A * cb * cg**2 - 4 * A * cb - 4 * C**2 * cb + 4 * C * ca * cg
          + 4 * C * cb - 4 * ca * cg)
    a0 = A**2 - 2 * A * C - 4 * A * cg**2 + 2 * A + C**2 - 2 * C + 1

    a4_safe = jnp.where(jnp.abs(a4) < 1e-12, 1e-12, a4)
    v, real_ok = solve_quartic(a3 / a4_safe, a2 / a4_safe, a1 / a4_safe, a0 / a4_safe)
    root_ok = real_ok & (v > 1e-6)

    # s1 from the beta equation: s1^2 (1 + v^2 - 2 v cb) = b^2.
    bb = b[..., None]
    cbb, cgb, cab = cb[..., None], cg[..., None], ca[..., None]
    Ab, Cb = A[..., None], C[..., None]
    denom1 = 1.0 + v * v - 2.0 * v * cbb
    s1 = bb / jnp.sqrt(jnp.maximum(denom1, 1e-20))
    root_ok = root_ok & (denom1 > 1e-12)

    # u from the gamma equation: u^2 - 2 u cg + (1 - C (1+v^2-2v cb)) = 0.
    const = 1.0 - Cb * denom1
    disc = jnp.maximum(cgb * cgb - const, 0.0)
    sq = jnp.sqrt(disc)
    u_cands = jnp.stack([cgb + sq, cgb - sq], axis=-1)  # (..., 4, 2)
    # Pick the root consistent with the alpha equation:
    # u^2 + v^2 - 2 u v ca - A (1 + v^2 - 2 v cb) = 0.
    resid = jnp.abs(
        u_cands**2 + (v**2)[..., None] - 2 * u_cands * v[..., None] * cab[..., None]
        - Ab[..., None] * denom1[..., None]
    )
    u = jnp.where(resid[..., 0] <= resid[..., 1], u_cands[..., 0], u_cands[..., 1])
    root_ok = root_ok & (u > 1e-6)

    s2 = u * s1
    s3 = v * s1
    root_ok = root_ok & (s1 > 0) & (s2 > 0) & (s3 > 0)

    # Camera-frame points and absolute orientation per root.
    Y = jnp.stack(
        [
            s1[..., None] * f1[..., None, :],
            s2[..., None] * f2[..., None, :],
            s3[..., None] * f3[..., None, :],
        ],
        axis=-2,
    )  # (..., 4, 3, 3) — per root, rows are the 3 camera points
    Pmat = jnp.stack([P1, P2, P3], axis=-2)[..., None, :, :]  # (..., 1, 3, 3)
    Pmat = jnp.broadcast_to(Pmat, Y.shape)
    R, t = _kabsch(Pmat, Y)
    return R, t, root_ok
