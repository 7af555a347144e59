"""Golden-data tests for the BA linear-solver stack — the analog of the
reference's gtest_ba_cholesky.cc / gtest_ba_conjugate_gradient.cc /
gtest_ba_sparse_matrix.cc suites. The reference validates Cholesky + CG +
sparse products on known matrices; here the equivalents are the batched
3x3 adjugate inverse, the matrix-free Schur-complement PCG, and the
cameras-/points-only solvers, validated against dense numpy solves of the
same damped normal equations.
"""

import numpy as np
import jax.numpy as jnp

from mve_tpu.sfm.ba import core


def _random_problem(C=3, P=12, obs_per_pt=2, seed=0):
    """Random Jacobian blocks with a known dense normal-equations form."""
    rng = np.random.RandomState(seed)
    cam_idx, pt_idx = [], []
    for p in range(P):
        for c in rng.choice(C, obs_per_pt, replace=False):
            cam_idx.append(c)
            pt_idx.append(p)
    O = len(cam_idx)
    cam_idx = np.asarray(cam_idx, np.int32)
    pt_idx = np.asarray(pt_idx, np.int32)
    Jc = rng.randn(O, 2, 9).astype(np.float64)
    Jp = rng.randn(O, 2, 3).astype(np.float64)
    f = rng.randn(O, 2).astype(np.float64)

    B = np.zeros((C, 9, 9))
    Cb = np.zeros((P, 3, 3))
    v = np.zeros((C, 9))
    w = np.zeros((P, 3))
    for o in range(O):
        B[cam_idx[o]] += Jc[o].T @ Jc[o]
        Cb[pt_idx[o]] += Jp[o].T @ Jp[o]
        v[cam_idx[o]] -= Jc[o].T @ f[o]
        w[pt_idx[o]] -= Jp[o].T @ f[o]
    return Jc, Jp, cam_idx, pt_idx, B, Cb, v, w, f


def _dense_solve(Jc, Jp, cam_idx, pt_idx, B, Cb, v, w, trr):
    """Dense reference solve of the damped system H [dc; dp] = [v; w]."""
    C, P, O = B.shape[0], Cb.shape[0], Jc.shape[0]
    n = 9 * C + 3 * P
    H = np.zeros((n, n))
    for c in range(C):
        Bd = B[c] + np.diag(np.diag(B[c])) / trr
        H[9 * c: 9 * c + 9, 9 * c: 9 * c + 9] = Bd
    for p in range(P):
        Cd = Cb[p] + np.diag(np.diag(Cb[p])) / trr
        H[9 * C + 3 * p: 9 * C + 3 * p + 3,
          9 * C + 3 * p: 9 * C + 3 * p + 3] = Cd
    for o in range(O):
        c, p = cam_idx[o], pt_idx[o]
        E = Jc[o].T @ Jp[o]
        H[9 * c: 9 * c + 9, 9 * C + 3 * p: 9 * C + 3 * p + 3] += E
        H[9 * C + 3 * p: 9 * C + 3 * p + 3, 9 * c: 9 * c + 9] += E.T
    rhs = np.concatenate([v.reshape(-1), w.reshape(-1)])
    x = np.linalg.solve(H, rhs)
    return x[: 9 * C].reshape(C, 9), x[9 * C:].reshape(P, 3)


def test_inv3x3_matches_numpy():
    rng = np.random.RandomState(1)
    A = rng.randn(16, 3, 3)
    A = A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(3)  # SPD
    inv = np.asarray(core._inv3x3(jnp.asarray(A)))
    np.testing.assert_allclose(inv, np.linalg.inv(A), rtol=1e-4, atol=1e-5)
    # Singular blocks -> zeros (iso with the reference's conventions for
    # empty point blocks).
    Z = np.zeros((2, 3, 3))
    np.testing.assert_array_equal(np.asarray(core._inv3x3(jnp.asarray(Z))), Z)


def test_solve_points_only_golden():
    _, Jp, _, pt_idx, _, Cb, _, w, _ = _random_problem(seed=2)
    trr = 50.0
    dp, _ = core.solve_points_only(jnp.asarray(Cb, jnp.float32),
                                   jnp.asarray(w, jnp.float32),
                                   jnp.asarray(trr, jnp.float32))
    dp = np.asarray(dp, np.float64)
    for p in range(Cb.shape[0]):
        Cd = Cb[p] + np.diag(np.diag(Cb[p])) / trr
        expect = np.linalg.solve(Cd, w[p])
        np.testing.assert_allclose(dp[p], expect, rtol=2e-3, atol=2e-4)


def test_solve_cameras_only_golden():
    Jc, _, cam_idx, _, B, _, v, _, _ = _random_problem(seed=3)
    trr = 100.0
    dc, _, n_cg = core.solve_cameras_only(
        jnp.asarray(Jc, jnp.float32), jnp.asarray(cam_idx),
        jnp.asarray(B, jnp.float32), jnp.asarray(v, jnp.float32),
        jnp.asarray(trr, jnp.float32))
    dc = np.asarray(dc, np.float64)
    for c in range(B.shape[0]):
        Bd = B[c] + np.diag(np.diag(B[c])) / trr
        expect = np.linalg.solve(Bd, v[c])
        np.testing.assert_allclose(dc[c], expect, rtol=5e-2, atol=5e-3)
    assert int(n_cg) > 0


def test_solve_schur_matches_dense_solve():
    """The matrix-free Schur PCG must reproduce the dense solve of the
    same damped normal equations (ba_linear_solver.cc:141-243 semantics:
    Schur complement + back-substitution is algebraically exact)."""
    Jc, Jp, cam_idx, pt_idx, B, Cb, v, w, _ = _random_problem(seed=4)
    trr = 10.0
    dc, dp, pred, n_cg = core.solve_schur(
        jnp.asarray(Jc, jnp.float32), jnp.asarray(Jp, jnp.float32),
        jnp.asarray(cam_idx), jnp.asarray(pt_idx),
        jnp.asarray(B, jnp.float32), jnp.asarray(Cb, jnp.float32),
        jnp.asarray(v, jnp.float32), jnp.asarray(w, jnp.float32),
        jnp.asarray(trr, jnp.float32))
    dc_e, dp_e = _dense_solve(Jc, Jp, cam_idx, pt_idx, B, Cb, v, w, trr)
    scale = max(np.abs(dc_e).max(), np.abs(dp_e).max())
    np.testing.assert_allclose(np.asarray(dc), dc_e,
                               rtol=5e-2, atol=2e-2 * scale)
    np.testing.assert_allclose(np.asarray(dp), dp_e,
                               rtol=5e-2, atol=2e-2 * scale)
    assert int(n_cg) > 0


def test_solve_schur_f64_tight():
    """In doubles the Schur solve matches the dense solve tightly."""
    import jax

    Jc, Jp, cam_idx, pt_idx, B, Cb, v, w, _ = _random_problem(seed=5)
    trr = 10.0
    with jax.enable_x64(True):
        dc, dp, _, _ = core.solve_schur(
            jnp.asarray(Jc), jnp.asarray(Jp),
            jnp.asarray(cam_idx), jnp.asarray(pt_idx),
            jnp.asarray(B), jnp.asarray(Cb),
            jnp.asarray(v), jnp.asarray(w), jnp.asarray(trr))
    dc_e, dp_e = _dense_solve(Jc, Jp, cam_idx, pt_idx, B, Cb, v, w, trr)
    np.testing.assert_allclose(np.asarray(dc), dc_e, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dp), dp_e, rtol=1e-6, atol=1e-8)
