"""Device kernels for bundle adjustment.

All functions are jit-compiled and operate on fixed-shape padded tensors:
    intr (C, 3) [f, k0, k1]; trans (C, 3); rot (C, 3, 3); points (P, 3)
    obs (O, 2); cam_idx (O,); pt_idx (O,); obs_valid (O,)

Residual model is identical to the reference
(bundle_adjustment.cc:204-266): project with R X + t, perspective divide,
radial distortion factor 1 + r2 (k0 + k1 r2), scale by focal length,
subtract the observation. Jacobians come from forward-mode autodiff of
that exact function (the reference's hand-derived chain rule at
bundle_adjustment.cc:307-635 computes the same quantities).

The Schur complement solve is matrix-free: S y = B_damped y - E C^-1 E^T y
where both E products are (O, ·) batched contractions + segment sums —
the TPU replacement for the reference's sparse matrix-matrix products
(ba_linear_solver.cc:141-243).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...math.rotation import rodrigues_to_matrix


# ---------------------------------------------------------------------------
# residuals + jacobians
# ---------------------------------------------------------------------------

def _residual_one(dc, dp, intr, trans, R, X, obs):
    """Residual for one observation with camera/point deltas applied.

    dc: (9,) [df, dk0, dk1, dt(3), dr(3)]; dp: (3,).
    """
    f = intr[0] + dc[0]
    k0 = intr[1] + dc[1]
    k1 = intr[2] + dc[2]
    t = trans + dc[3:6]
    Rd = rodrigues_to_matrix(dc[6:9]) @ R
    Xn = X + dp
    pc = Rd @ Xn + t
    z = pc[2]
    x = pc[0] / z
    y = pc[1] / z
    r2 = x * x + y * y
    d = 1.0 + r2 * (k0 + k1 * r2)
    return jnp.stack([x * d * f - obs[0], y * d * f - obs[1]])


def _residual_jac_one(intr, trans, R, X, obs):
    zero9 = jnp.zeros(9, dtype=intr.dtype)
    zero3 = jnp.zeros(3, dtype=intr.dtype)
    f = _residual_one(zero9, zero3, intr, trans, R, X, obs)
    Jc = jax.jacfwd(_residual_one, argnums=0)(zero9, zero3, intr, trans, R, X, obs)
    Jp = jax.jacfwd(_residual_one, argnums=1)(zero9, zero3, intr, trans, R, X, obs)
    return f, Jc, Jp


@functools.partial(jax.jit, static_argnames=("mode", "fixed_intrinsics"))
def build_system(intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid,
                 mode: int = 3, fixed_intrinsics: bool = False):
    """Residuals, Jacobian blocks and Hessian blocks for the whole problem.

    Returns dict with f (O,2), Jc (O,2,9), Jp (O,2,3), B (C,9,9),
    Cb (P,3,3), v (C,9), w (P,3).
    """
    C = intr.shape[0]
    P = points.shape[0]

    gi = intr[cam_idx]
    gt = trans[cam_idx]
    gR = rot[cam_idx]
    gX = points[pt_idx]
    f, Jc, Jp = jax.vmap(_residual_jac_one)(gi, gt, gR, gX, obs)
    ov = obs_valid.astype(f.dtype)
    f = f * ov[:, None]
    Jc = Jc * ov[:, None, None]
    Jp = Jp * ov[:, None, None]
    if not (mode & 1):  # no camera optimization
        Jc = jnp.zeros_like(Jc)
    if not (mode & 2):  # no point optimization
        Jp = jnp.zeros_like(Jp)
    if fixed_intrinsics:
        mask = jnp.concatenate([jnp.zeros(3, f.dtype), jnp.ones(6, f.dtype)])
        Jc = Jc * mask[None, None, :]

    B = jax.ops.segment_sum(jnp.einsum("oik,oil->okl", Jc, Jc), cam_idx, num_segments=C)
    Cb = jax.ops.segment_sum(jnp.einsum("oik,oil->okl", Jp, Jp), pt_idx, num_segments=P)
    v = -jax.ops.segment_sum(jnp.einsum("oik,oi->ok", Jc, f), cam_idx, num_segments=C)
    w = -jax.ops.segment_sum(jnp.einsum("oik,oi->ok", Jp, f), pt_idx, num_segments=P)
    return {"f": f, "Jc": Jc, "Jp": Jp, "B": B, "Cb": Cb, "v": v, "w": w}


@jax.jit
def compute_residuals(intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid):
    gi = intr[cam_idx]
    gt = trans[cam_idx]
    gR = rot[cam_idx]
    gX = points[pt_idx]
    zero9 = jnp.zeros((obs.shape[0], 9), intr.dtype)
    zero3 = jnp.zeros((obs.shape[0], 3), intr.dtype)
    f = jax.vmap(_residual_one)(zero9, zero3, gi, gt, gR, gX, obs)
    return f * obs_valid.astype(f.dtype)[:, None]


def compute_mse(f, num_valid):
    """MSE per observation = sum(f^2) / num_observations
    (bundle_adjustment.cc compute_mse divides by F.size()/2)."""
    return jnp.sum(f * f) / jnp.maximum(num_valid, 1)


# ---------------------------------------------------------------------------
# 3x3 closed-form inverse (batched)
# ---------------------------------------------------------------------------

def _inv3x3(M, eps=0.0):
    """Batched adjugate inverse; singular blocks -> zeros (matches the
    reference's invert_block_matrix_3x3_inplace via cholesky which leaves
    garbage for empty points — those have zero w so the product is 0)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    ok = jnp.abs(det) > 1e-30
    det_safe = jnp.where(ok, det, 1.0)
    adj = jnp.stack(
        [jnp.stack([A, B, Cc], axis=-1),
         jnp.stack([D, E, F], axis=-1),
         jnp.stack([G, H, I], axis=-1)],
        axis=-2,
    )
    inv = adj / det_safe[..., None, None]
    return jnp.where(ok[..., None, None], inv, 0.0)


def _damp_diag(M, trr):
    """Multiply diagonal by (1 + 1/trust_region_radius)
    (ba_linear_solver.cc:177-179)."""
    k = M.shape[-1]
    eye = jnp.eye(k, dtype=M.dtype)
    return M + M * eye * (1.0 / trr)


# ---------------------------------------------------------------------------
# Schur-complement PCG (matrix-free)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cg_max_iter",))
def solve_schur(Jc, Jp, cam_idx, pt_idx, B, Cb, v, w, trr,
                cg_max_iter: int = 1000):
    """Solve the damped normal equations via the Schur complement on the
    reduced camera system with block-Jacobi (damped B) preconditioning.

    Returns (delta_cam (C,9), delta_pt (P,3), pred_decrease, num_iters).
    """
    C = B.shape[0]
    P = Cb.shape[0]
    dtype = B.dtype

    B_d = _damp_diag(B, trr)
    C_d = _damp_diag(Cb, trr)
    C_inv = _inv3x3(C_d)
    # Preconditioner: inverse of damped B blocks. Singular (padded/unused
    # camera) blocks -> identity so CG stays finite.
    eye9 = jnp.eye(9, dtype=dtype)
    B_reg = B_d + eye9 * jnp.where(
        jnp.abs(jnp.linalg.det(B_d))[:, None, None] < 1e-20, 1.0, 0.0)
    M_inv = jnp.linalg.inv(B_reg)

    def E_T_y(y):
        """(C,9) -> (P,3): per point sum of Jp^T (Jc y[cam])."""
        tmp = jnp.einsum("oij,oj->oi", Jc, y[cam_idx])  # (O, 2)
        return jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", Jp, tmp), pt_idx, num_segments=P)

    def E_z(z):
        """(P,3) -> (C,9): per camera sum of Jc^T (Jp z[point])."""
        tmp = jnp.einsum("oij,oj->oi", Jp, z[pt_idx])  # (O, 2)
        return jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", Jc, tmp), cam_idx, num_segments=C)

    def S_mul(y):
        By = jnp.einsum("cij,cj->ci", B_d, y)
        u = E_T_y(y)
        z = jnp.einsum("pij,pj->pi", C_inv, u)
        return By - E_z(z)

    def precond(r):
        return jnp.einsum("cij,cj->ci", M_inv, r)

    rhs = v - E_z(jnp.einsum("pij,pj->pi", C_inv, w))

    # PCG (ba_conjugate_gradient.h:100-208 semantics: abs tolerance 1e-20
    # on ||r||^2, preconditioned directions). The reference's absolute
    # 1e-20 is reachable in its doubles but not in float32, so the
    # termination is the reference tolerance OR machine precision relative
    # to the initial residual (||r||^2 < 100 eps^2 ||r0||^2 — for f64 this
    # reduces to the reference's behavior). Iterations are additionally
    # capped at the Krylov dimension 9C, where exact CG has converged.
    y0 = jnp.zeros_like(v)
    r0 = rhs
    z0 = precond(r0)
    d0 = z0
    rz0 = jnp.sum(r0 * z0)
    rr0 = jnp.sum(r0 * r0)
    eps = jnp.finfo(dtype).eps
    tol = jnp.maximum(jnp.asarray(1e-20, dtype), rr0 * (eps * eps * 100.0))
    max_it = min(cg_max_iter, 9 * C)

    def cond(state):
        i, y, r, d, rz, done = state
        return (~done) & (i < max_it)

    def body(state):
        i, y, r, d, rz, done = state
        Ad = S_mul(d)
        dAd = jnp.sum(d * Ad)
        alpha = rz / jnp.where(jnp.abs(dAd) < 1e-30, 1e-30, dAd)
        y = y + alpha * d
        r = r - alpha * Ad
        rr = jnp.sum(r * r)
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        d = z + beta * d
        done = rr < tol
        return (i + 1, y, r, d, rz_new, done)

    i, y, r, d, rz, done = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), y0, r0, d0, rz0, rr0 < tol))

    delta_y = y
    # Back-substitution: delta_z = C^-1 (w - E^T delta_y).
    delta_z = jnp.einsum("pij,pj->pi", C_inv, w - E_T_y(delta_y))

    # Predicted error decrease (ba_linear_solver.cc:230-236):
    # dy . (B_diag dy / trr + v) + dz . (C_diag dz / trr + w)
    B_diag = B * jnp.eye(9, dtype=dtype)
    C_diag = Cb * jnp.eye(3, dtype=dtype)
    pred = jnp.sum(delta_y * (jnp.einsum("cij,cj->ci", B_diag, delta_y) / trr + v))
    pred = pred + jnp.sum(delta_z * (jnp.einsum("pij,pj->pi", C_diag, delta_z) / trr + w))
    return delta_y, delta_z, pred, i


@functools.partial(jax.jit, static_argnames=("cg_max_iter",))
def solve_cameras_only(Jc, cam_idx, B, v, trr, cg_max_iter: int = 1000):
    """BA_CAMERAS mode: CG on the damped camera system with scalar-diagonal
    preconditioner (ba_linear_solver.cc:245-313, block_size=0)."""
    C = B.shape[0]
    dtype = B.dtype
    B_d = _damp_diag(B, trr)
    diag = jnp.diagonal(B_d, axis1=-2, axis2=-1)  # (C, 9)
    pre = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)

    def S_mul(y):
        # Full H y would need E blocks; cameras-only means H = B exactly
        # (points fixed), block-diagonal per camera.
        return jnp.einsum("cij,cj->ci", B_d, y)

    y0 = jnp.zeros_like(v)
    r0 = v
    z0 = pre * r0
    d0 = z0
    rz0 = jnp.sum(r0 * z0)
    rr0 = jnp.sum(r0 * r0)
    # Same termination rule as solve_schur: reference 1e-20 absolute OR
    # float-precision-relative, capped at the Krylov dimension.
    eps = jnp.finfo(dtype).eps
    tol = jnp.maximum(jnp.asarray(1e-20, dtype), rr0 * (eps * eps * 100.0))
    max_it = min(cg_max_iter, 9 * C)

    def cond(state):
        i, y, r, d, rz, done = state
        return (~done) & (i < max_it)

    def body(state):
        i, y, r, d, rz, done = state
        Ad = S_mul(d)
        dAd = jnp.sum(d * Ad)
        alpha = rz / jnp.where(jnp.abs(dAd) < 1e-30, 1e-30, dAd)
        y = y + alpha * d
        r = r - alpha * Ad
        rr = jnp.sum(r * r)
        z = pre * r
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        d = z + beta * d
        done = rr < tol
        return (i + 1, y, r, d, rz_new, done)

    i, y, r, d, rz, done = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), y0, r0, d0, rz0, rr0 < tol))
    B_diag = B * jnp.eye(9, dtype=dtype)
    pred = jnp.sum(y * (jnp.einsum("cij,cj->ci", B_diag, y) / trr + v))
    return y, pred, i


@jax.jit
def solve_points_only(Cb, w, trr):
    """BA_POINTS mode: direct damped 3x3 block solves
    (ba_linear_solver.cc:296-302)."""
    C_d = _damp_diag(Cb, trr)
    C_inv = _inv3x3(C_d)
    z = jnp.einsum("pij,pj->pi", C_inv, w)
    C_diag = Cb * jnp.eye(3, dtype=Cb.dtype)
    pred = jnp.sum(z * (jnp.einsum("pij,pj->pi", C_diag, z) / trr + w))
    return z, pred


# ---------------------------------------------------------------------------
# parameter update (bundle_adjustment.cc:640-697)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# fully on-device LM loop
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "mode", "fixed_intrinsics", "max_iters", "cg_max_iter"))
def lm_optimize_device(intr, trans, rot, points, obs, cam_idx, pt_idx,
                       obs_valid, num_valid,
                       mode: int = 3, fixed_intrinsics: bool = False,
                       max_iters: int = 50, cg_max_iter: int = 1000,
                       lm_delta_threshold: float = 1e-4,
                       lm_mse_threshold: float = 1e-8):
    """The entire LM trust-region loop as ONE device program
    (lax.while_loop), replicating bundle_adjustment.cc:73-201: trust
    region init 1000, halving on failure, gain-ratio growth on success,
    delta-MSE-ratio and MSE termination. One dispatch per BA instead of
    one per LM step — the difference between host-driven and TPU-resident
    optimization (dominant when dispatch latency is nontrivial).

    Returns (intr, trans, rot, points, status_vec) with status_vec =
    [initial_mse, final_mse, lm_iters, lm_success, lm_fail, cg_iters].
    """
    dtype = intr.dtype
    f0 = compute_residuals(intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid)
    mse0 = compute_mse(f0, num_valid)

    def solve(sys, trr):
        if mode == 3:
            dc, dp, pred, n_cg = solve_schur(
                sys["Jc"], sys["Jp"], cam_idx, pt_idx, sys["B"], sys["Cb"],
                sys["v"], sys["w"], trr, cg_max_iter=cg_max_iter)
        elif mode == 1:
            dc, pred, n_cg = solve_cameras_only(
                sys["Jc"], cam_idx, sys["B"], sys["v"], trr,
                cg_max_iter=cg_max_iter)
            dp = jnp.zeros_like(points)
        else:
            dp, pred = solve_points_only(sys["Cb"], sys["w"], trr)
            dc = jnp.zeros((intr.shape[0], 9), dtype)
            n_cg = jnp.zeros((), jnp.int32)
        return dc, dp, pred, n_cg

    def cond(state):
        (ii, tt, rr, pp, trr, mse, it, done, ns, nf, cg) = state
        return (~done) & (it < max_iters)

    def body(state):
        (ii, tt, rr, pp, trr, mse, it, done, ns, nf, cg) = state
        sys = build_system(ii, tt, rr, pp, obs, cam_idx, pt_idx, obs_valid,
                           mode=mode, fixed_intrinsics=fixed_intrinsics)
        dc, dp, pred, n_cg = solve(sys, trr)
        ni, nt, nr, npts = apply_update(ii, tt, rr, pp, dc, dp,
                                        fixed_intrinsics=fixed_intrinsics)
        f_new = compute_residuals(ni, nt, nr, npts, obs, cam_idx, pt_idx, obs_valid)
        new_mse = compute_mse(f_new, num_valid)
        delta_mse = mse - new_mse
        success = delta_mse > 0.0

        gain = delta_mse * num_valid / jnp.where(pred == 0.0, 1.0, pred)
        tr_up = 1.0 / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * gain - 1.0) ** 3)
        new_trr = jnp.where(success, trr * tr_up, trr * 0.5)

        ii = jnp.where(success, ni, ii)
        tt = jnp.where(success, nt, tt)
        rr = jnp.where(success, nr, rr)
        pp = jnp.where(success, npts, pp)
        mse_next = jnp.where(success, new_mse, mse)

        delta_ratio = 1.0 - new_mse / jnp.maximum(mse, 1e-300)
        new_done = (success & (delta_ratio < lm_delta_threshold)) | (
            mse_next < lm_mse_threshold)
        return (ii, tt, rr, pp, new_trr, mse_next, it + 1, new_done,
                ns + success.astype(jnp.int32),
                nf + (~success).astype(jnp.int32), cg + n_cg)

    init = (intr, trans, rot, points,
            jnp.asarray(1000.0, dtype), mse0,
            jnp.zeros((), jnp.int32), mse0 < lm_mse_threshold,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32))
    (ii, tt, rr, pp, trr, mse, it, done, ns, nf, cg) = jax.lax.while_loop(
        cond, body, init)
    status = jnp.stack([mse0, mse, it.astype(dtype), ns.astype(dtype),
                        nf.astype(dtype), cg.astype(dtype)])
    return ii, tt, rr, pp, status


@functools.partial(jax.jit, static_argnames=("fixed_intrinsics",))
def apply_update(intr, trans, rot, points, delta_cam, delta_pt,
                 fixed_intrinsics: bool = False):
    if fixed_intrinsics:
        new_intr = intr
    else:
        new_intr = intr + delta_cam[:, 0:3]
    new_trans = trans + delta_cam[:, 3:6]
    R_upd = rodrigues_to_matrix(delta_cam[:, 6:9])
    new_rot = jnp.einsum("cij,cjk->cik", R_upd, rot)
    new_points = points + delta_pt
    return new_intr, new_trans, new_rot, new_points
