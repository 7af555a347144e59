"""RANSAC estimators (reference: libs/sfm/ransac_fundamental.cc,
ransac_homography.cc, ransac_pose_p3p.cc).

TPU-native shape: instead of the reference's sequential hypothesis loop,
ALL max_iterations hypotheses are solved and scored in one batched device
evaluation — minimal-sample solves are a batched SVD / closed form, and
inlier counting is one (B, N) reduction. Random minimal samples are drawn
on host (cheap) with numpy RNG, matching the reference's use of a seeded
RNG (util::system::rand).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax as _jax
import jax.numpy as jnp

from . import fundamental as fu
from . import homography as ho
from . import p3p as p3p_mod


@dataclasses.dataclass
class RansacOptions:
    max_iterations: int = 1000
    threshold: float = 0.0015  # ransac_fundamental.h:88-90 default
    verbose_output: bool = False
    # Minimum padded correspondence count. Incremental SfM sets this once
    # (to the max feature count over all views) so every resection in a
    # run reuses ONE compiled scoring program instead of compiling each
    # power-of-two bucket as the track counts grow.
    min_pad: int = 0


def _sample_indices(rng: np.random.RandomState, n: int, k: int, batch: int) -> np.ndarray:
    """(batch, k) unique-per-row random index samples.

    Vectorized redraw-on-collision: rng.choice(replace=False) is O(n)
    PER ROW, which made the 1000-hypothesis P3P sampler ~1s per
    resection at 100-view correspondence counts (~17s of incremental
    wall-clock). Collisions at k<=8, n>=2k are rare, so a few redraw
    sweeps converge; tiny n falls back to the exact per-row draw."""
    if n < 2 * k or k > 8:
        out = np.empty((batch, k), np.int64)
        for i in range(batch):
            out[i] = rng.choice(n, size=k, replace=False)
        return out
    out = rng.randint(0, n, size=(batch, k))
    for _ in range(64):
        out_sorted = np.sort(out, axis=1)
        bad = (out_sorted[:, 1:] == out_sorted[:, :-1]).any(axis=1)
        if not bad.any():
            return out
        out[bad] = rng.randint(0, n, size=(int(bad.sum()), k))
    # Pathological leftovers (shouldn't happen with the n >= 2k guard).
    for i in np.nonzero(bad)[0]:
        out[i] = rng.choice(n, size=k, replace=False)
    return out


@dataclasses.dataclass
class RansacResult:
    model: np.ndarray
    inliers: np.ndarray  # indices into the correspondence array
    score: int = 0


def ransac_fundamental(p1, p2, opts: RansacOptions = RansacOptions(),
                       rng: np.random.RandomState | None = None) -> RansacResult:
    """8-point RANSAC for F with Sampson scoring
    (ransac_fundamental.cc:107)."""
    rng = rng or np.random.RandomState(0)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    n = len(p1)
    if n < 8:
        raise ValueError("At least 8 correspondences required")
    B = opts.max_iterations
    idx = _sample_indices(rng, n, 8, B)
    p1p, p2p, valid = _pad_corr(p1, p2, n)
    F, best_mask, count = _fund_solve_score(
        jnp.asarray(p1[idx]), jnp.asarray(p2[idx]),
        jnp.asarray(p1p), jnp.asarray(p2p), jnp.asarray(valid),
        jnp.asarray(opts.threshold ** 2, jnp.float32))
    best_mask = np.asarray(best_mask)[:n]
    return RansacResult(
        model=np.asarray(F),
        inliers=np.nonzero(best_mask)[0].astype(np.int32),
        score=int(count),
    )


def _pad_corr(p1, p2, n):
    """Pad correspondence arrays to a power-of-two bucket: incremental
    SfM calls these RANSACs with a different N every iteration, and each
    unique shape is an XLA compile (seconds over the remote tunnel)."""
    Nb = 1 << max(6, int(np.ceil(np.log2(max(n, 1)))))
    p1p = np.zeros((Nb, 2), np.float32)
    p1p[:n] = p1
    p2p = np.zeros((Nb, 2), np.float32)
    p2p[:n] = p2
    return p1p, p2p, np.arange(Nb) < n


@_jax.jit
def _fund_solve_score(s1, s2, p1, p2, valid, thr_sq):
    """8-point hypotheses + Sampson scoring + best selection, fused
    (ransac_fundamental.cc:107 in one program)."""
    F = fu.fundamental_8_point(s1, s2)              # (B, 3, 3)
    d = fu.sampson_distance(F, p1[None], p2[None])  # (B, Nb)
    inl = (d < thr_sq) & valid[None]
    counts = inl.sum(axis=1)
    best = jnp.argmax(counts)
    return F[best], inl[best], counts[best]


def ransac_homography(p1, p2, opts: RansacOptions | None = None,
                      rng: np.random.RandomState | None = None) -> RansacResult:
    """4-point DLT RANSAC for H with symmetric transfer error scoring
    (ransac_homography.cc:100)."""
    opts = opts or RansacOptions(threshold=0.005)  # ransac_homography.h:85-87
    rng = rng or np.random.RandomState(0)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    n = len(p1)
    if n < 4:
        raise ValueError("At least 4 correspondences required")
    B = opts.max_iterations
    idx = _sample_indices(rng, n, 4, B)
    p1p, p2p, valid = _pad_corr(p1, p2, n)
    H, best_mask, count = _homog_solve_score(
        jnp.asarray(p1[idx]), jnp.asarray(p2[idx]),
        jnp.asarray(p1p), jnp.asarray(p2p), jnp.asarray(valid),
        jnp.asarray(opts.threshold ** 2, jnp.float32))
    best_mask = np.asarray(best_mask)[:n]
    return RansacResult(
        model=np.asarray(H),
        inliers=np.nonzero(best_mask)[0].astype(np.int32),
        score=int(count),
    )


@_jax.jit
def _homog_solve_score(s1, s2, p1, p2, valid, thr_sq):
    """4-point DLT hypotheses + symmetric transfer scoring + best
    selection, fused (ransac_homography.cc:100 in one program)."""
    H = ho.homography_dlt(s1, s2)
    err = ho.symmetric_transfer_error(H, p1[None], p2[None])
    inl = (err < thr_sq) & valid[None]
    counts = inl.sum(axis=1)
    best = jnp.argmax(counts)
    return H[best], inl[best], counts[best]


@dataclasses.dataclass
class RansacPoseResult:
    R: np.ndarray
    t: np.ndarray
    inliers: np.ndarray


def ransac_pose_p3p(points_3d, points_2d, K, opts: RansacOptions | None = None,
                    rng: np.random.RandomState | None = None) -> RansacPoseResult:
    """P3P RANSAC for 2D-3D pose (ransac_pose_p3p.cc:124).

    points_2d are normalized image coordinates; threshold likewise
    (ransac_pose_p3p.h:31-55). Scores all 4 P3P roots of every sample.
    """
    opts = opts or RansacOptions(threshold=0.005)
    rng = rng or np.random.RandomState(0)
    points_3d = np.asarray(points_3d, np.float64)
    points_2d = np.asarray(points_2d, np.float64)
    n = len(points_3d)
    if n < 3:
        raise ValueError("At least 3 correspondences required")
    K = np.asarray(K, np.float64)
    Kinv = np.linalg.inv(K)
    h2d = np.concatenate([points_2d, np.ones((n, 1))], axis=1)
    bearings = (Kinv @ h2d.T).T
    bearings /= np.linalg.norm(bearings, axis=1, keepdims=True)

    B = opts.max_iterations
    idx = _sample_indices(rng, n, 3, B)
    # ONE fused device program: P3P solves for all B samples, (B, 4)
    # pose scoring over all N points, argmax — a single tunnel round
    # trip per call instead of an eager op chain. N is padded to powers
    # of two (or opts.min_pad when set) so an incremental SfM run
    # compiles O(log N) variants — exactly one with min_pad pre-sized.
    Nb = max(1 << max(6, int(np.ceil(np.log2(n)))), opts.min_pad)
    X = np.zeros((Nb, 3), np.float32)
    X[:n] = points_3d
    p2d = np.zeros((Nb, 2), np.float32)
    p2d[:n] = points_2d
    valid_n = np.arange(Nb) < n
    R, t, best_mask = _p3p_solve_score(
        jnp.asarray(points_3d[idx], jnp.float32),
        jnp.asarray(bearings[idx], jnp.float32),
        jnp.asarray(X), jnp.asarray(p2d), jnp.asarray(valid_n),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(opts.threshold, jnp.float32))
    best_mask = np.asarray(best_mask)[:n]
    return RansacPoseResult(
        R=np.asarray(R, np.float64),
        t=np.asarray(t, np.float64),
        inliers=np.nonzero(best_mask)[0].astype(np.int32),
    )


@_jax.jit
def _p3p_solve_score(sample_X, sample_bearing, X, p2d, valid_n, K, threshold):
    """P3P hypotheses + inlier scoring + best-pose selection, fused.

    sample_X/sample_bearing: (B, 3, 3); X: (Nb, 3) padded points; p2d:
    (Nb, 2); valid_n: (Nb,). Returns (R (3,3), t (3,), mask (Nb,))."""
    Rs, ts, valid = p3p_mod.pose_p3p(sample_X, sample_bearing)
    pc = jnp.einsum("bkij,nj->bkni", Rs, X) + ts[:, :, None, :]  # (B,4,N,3)
    z_ok = pc[..., 2] > 1e-9
    proj = jnp.einsum("ij,bknj->bkni", K, pc)
    uv = proj[..., :2] / jnp.where(
        jnp.abs(proj[..., 2:]) < 1e-20, 1e-20, proj[..., 2:])
    err = jnp.linalg.norm(uv - p2d[None, None], axis=-1)
    inl = (err < threshold) & z_ok & valid[..., None] & valid_n[None, None]
    counts = inl.sum(axis=-1)                                   # (B, 4)
    flat = jnp.argmax(counts.reshape(-1))
    bi, bk = flat // 4, flat % 4
    return Rs[bi, bk], ts[bi, bk], inl[bi, bk]
