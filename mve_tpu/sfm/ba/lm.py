"""Levenberg-Marquardt driver (reference: bundle_adjustment.cc:26-201).

Host-side trust-region loop exactly mirroring the reference:
TRR init 1000, halved on failed step; on success the gain-ratio rule
TRR *= 1 / max(1/3, 1 - (2g - 1)^3) with
g = delta_mse * num_obs / predicted_decrease. The fast path runs the
whole loop as ONE device program (core.lm_optimize_device), AOT-compiled
once per distinct padded shape with the compile time recorded in
utils.compile_stats — an incremental SfM run pre-sizes the pads to the
final problem size so the entire run reuses a single compiled program
per BA mode (the r04 bottleneck was one fresh XLA compile per
power-of-two bucket growth, dominating 100-view wall-clock).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import jax.numpy as jnp

from . import core
from .problem import BAProblem, BundleMode
from ...utils import compile_stats

TRUST_REGION_RADIUS_INIT = 1000.0
TRUST_REGION_RADIUS_DECREMENT = 0.5


@dataclasses.dataclass
class BAOptions:
    """bundle_adjustment.h:61-74 + :139-147 defaults."""

    bundle_mode: BundleMode = BundleMode.CAMERAS_AND_POINTS
    fixed_intrinsics: bool = False
    lm_max_iterations: int = 50
    lm_min_iterations: int = 0
    lm_delta_threshold: float = 1e-4
    lm_mse_threshold: float = 1e-8
    cg_max_iterations: int = 1000
    verbose_output: bool = False
    dtype: object = np.float32
    # Optional jax.sharding.Mesh: shard the observation axis over it and
    # run the SAME device LM loop with psum collectives (SURVEY §2.9 /
    # parallel/distributed_ba.py). None = single device.
    mesh: object = None
    # Minimum padded sizes for (cameras, points, observations). An
    # incremental SfM run sets these ONCE to the final problem bound so
    # every BA in the run hits the same compiled program; 0 = plain
    # power-of-two bucketing per call.
    pad_cameras: int = 0
    pad_points: int = 0
    pad_observations: int = 0


@dataclasses.dataclass
class BAStatus:
    """bundle_adjustment.h:76-87."""

    initial_mse: float = 0.0
    final_mse: float = 0.0
    num_lm_iterations: int = 0
    num_lm_successful_iterations: int = 0
    num_lm_unsuccessful_iterations: int = 0
    num_cg_iterations: int = 0
    runtime_ms: int = 0


def _pad(arr, n, axis=0):
    pad_n = n - arr.shape[axis]
    if pad_n <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad_n)
    return np.pad(arr, widths)


def _bucket(n, minimum=64):
    """Next power of two: bounds the number of distinct compiled shapes
    across an incremental SfM run to O(log problem size) per dimension
    (each unique shape costs a full XLA compile of the LM program)."""
    size = minimum
    while size < n:
        size *= 2
    return size


# AOT-compiled lm_optimize_device executables keyed by
# (shapes, mode, flags, dtype). Compiling explicitly (rather than
# relying on jit's internal cache) lets the compile time be measured and
# attributed exactly.
_LM_EXECUTABLES: dict = {}


def _lm_compiled(key, args, static_kwargs):
    exe = _LM_EXECUTABLES.get(key)
    if exe is None:
        t0 = time.perf_counter()
        lowered = core.lm_optimize_device.lower(*args, **static_kwargs)
        exe = lowered.compile()
        compile_stats.record("ba_lm", (time.perf_counter() - t0) * 1000.0)
        _LM_EXECUTABLES[key] = exe
    return exe


def optimize_arrays(intr_np, trans_np, rot_np, points_np,
                    obs_np, cam_idx_np, pt_idx_np,
                    opts: BAOptions) -> tuple:
    """Array-level LM optimization.

    Inputs are unpadded numpy arrays: intr (C,3) [f,k0,k1], trans (C,3),
    rot (C,3,3), points (P,3), obs (O,2), cam_idx (O,), pt_idx (O,).
    Returns (intr, trans, rot, points, BAStatus) with the same unpadded
    shapes (float64).
    """
    t0 = time.perf_counter()
    status = BAStatus()
    dtype = opts.dtype
    mode = int(opts.bundle_mode)

    C, P, O = len(intr_np), len(points_np), len(obs_np)
    Cp = max(_bucket(C, 16), opts.pad_cameras)
    Pp = max(_bucket(P, 256), opts.pad_points)
    Op = max(_bucket(O, 512), opts.pad_observations)
    if opts.mesh is not None:
        m = opts.mesh.size  # shard axis must divide the padded O
        Op = (Op + m - 1) // m * m

    intr = np.ascontiguousarray(_pad(intr_np, Cp), dtype)
    # Padded cameras get f=1 so the residual function stays finite.
    if Cp > C:
        intr[C:, 0] = 1.0
    trans = np.ascontiguousarray(_pad(trans_np, Cp), dtype)
    rot_pad = _pad(rot_np, Cp).astype(dtype)
    rot_pad[C:] = np.eye(3)
    points = np.ascontiguousarray(_pad(points_np, Pp), dtype)
    if Pp > P:
        points[P:, 2] = 1.0
    obs = np.ascontiguousarray(_pad(obs_np, Op), dtype)
    cam_idx = np.pad(cam_idx_np, (0, Op - O))
    pt_idx = np.pad(pt_idx_np, (0, Op - O))
    obs_valid = np.arange(Op) < O

    intr = jnp.asarray(intr)
    trans = jnp.asarray(trans)
    rot = jnp.asarray(rot_pad)
    points = jnp.asarray(points)
    obs = jnp.asarray(obs)
    cam_idx = jnp.asarray(cam_idx)
    pt_idx = jnp.asarray(pt_idx)
    obs_valid = jnp.asarray(obs_valid)
    num_valid = jnp.asarray(O, dtype)

    kwargs = dict(
        mode=mode, fixed_intrinsics=opts.fixed_intrinsics,
        max_iters=opts.lm_max_iterations,
        cg_max_iter=opts.cg_max_iterations,
        lm_delta_threshold=opts.lm_delta_threshold,
        lm_mse_threshold=opts.lm_mse_threshold)
    args = (intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid,
            num_valid)
    if opts.mesh is not None:
        from ...parallel.distributed_ba import lm_optimize_distributed

        ii, tt, rr, pp, st = lm_optimize_distributed(opts.mesh, *args,
                                                     **kwargs)
    else:
        key = (Cp, Pp, Op, mode, opts.fixed_intrinsics,
               opts.lm_max_iterations, opts.cg_max_iterations,
               opts.lm_delta_threshold, opts.lm_mse_threshold,
               np.dtype(dtype).str)
        exe = _lm_compiled(key, args, kwargs)
        # Thresholds are traced (non-static) scalars; pass them at call
        # time with the same kwargs pytree the program was lowered with.
        ii, tt, rr, pp, st = exe(
            *args, lm_delta_threshold=opts.lm_delta_threshold,
            lm_mse_threshold=opts.lm_mse_threshold)
    st = np.asarray(st, np.float64)
    status.initial_mse = float(st[0])
    status.final_mse = float(st[1])
    status.num_lm_iterations = int(st[2])
    status.num_lm_successful_iterations = int(st[3])
    status.num_lm_unsuccessful_iterations = int(st[4])
    status.num_cg_iterations = int(st[5])
    status.runtime_ms = int((time.perf_counter() - t0) * 1000)
    return (np.asarray(ii)[:C].astype(np.float64),
            np.asarray(tt)[:C].astype(np.float64),
            np.asarray(rr)[:C].astype(np.float64),
            np.asarray(pp)[:P].astype(np.float64),
            status)


class BundleAdjustment:
    """Mirrors sfm::ba::BundleAdjustment (bundle_adjustment.h:51-134)."""

    def __init__(self, options: BAOptions | None = None):
        self.opts = options or BAOptions()
        self.status = BAStatus()

    def optimize(self, problem: BAProblem) -> BAStatus:
        t0 = time.perf_counter()
        self.status = BAStatus()
        if np.dtype(self.opts.dtype) == np.float64:
            # f64 path (the reference runs doubles throughout,
            # bundle_adjustment.cc): TPUs have no native f64, so the
            # double-precision solve runs the SAME programs on the CPU
            # backend under x64 — for ill-conditioned Schur systems where
            # f32 stalls (BAOptions.dtype=np.float64 to opt in).
            import contextlib

            import jax

            with contextlib.ExitStack() as stack:
                stack.enter_context(jax.enable_x64(True))
                stack.enter_context(
                    jax.default_device(jax.local_devices(backend="cpu")[0]))
                self._lm_optimize(problem)
        else:
            self._lm_optimize(problem)
        self.status.runtime_ms = int((time.perf_counter() - t0) * 1000)
        return self.status

    # ------------------------------------------------------------------
    def _lm_optimize(self, problem: BAProblem) -> None:
        opts = self.opts

        intr_np, trans_np, rot_np, cam_const = problem.camera_arrays()
        points_np, pt_const = problem.point_array()
        obs_np, cam_idx_np, pt_idx_np = problem.observation_arrays()

        if not opts.verbose_output:
            # Fast path: the whole LM loop as one device program.
            # The verbose path below drives the loop from the host so
            # per-iteration status can print.
            ii, tt, rr, pp, self.status = optimize_arrays(
                intr_np, trans_np, rot_np, points_np,
                obs_np, cam_idx_np, pt_idx_np, opts)
            problem.update_from_arrays(ii, tt, rr, pp)
            return

        dtype = opts.dtype
        mode = int(opts.bundle_mode)
        C, P, O = len(intr_np), len(points_np), len(obs_np)
        Cp = max(_bucket(C, 16), opts.pad_cameras)
        Pp = max(_bucket(P, 256), opts.pad_points)
        Op = max(_bucket(O, 512), opts.pad_observations)
        if opts.mesh is not None:
            m = opts.mesh.size
            Op = (Op + m - 1) // m * m

        intr = jnp.asarray(_pad(intr_np, Cp).astype(dtype))
        if Cp > C:
            intr = intr.at[C:, 0].set(1.0)
        trans = jnp.asarray(_pad(trans_np, Cp).astype(dtype))
        rot_pad = _pad(rot_np, Cp)
        rot_pad[C:] = np.eye(3)
        rot = jnp.asarray(rot_pad.astype(dtype))
        points = jnp.asarray(_pad(points_np, Pp).astype(dtype))
        if Pp > P:
            points = points.at[P:, 2].set(1.0)
        obs = jnp.asarray(_pad(obs_np, Op).astype(dtype))
        cam_idx = jnp.asarray(np.pad(cam_idx_np, (0, Op - O)))
        pt_idx = jnp.asarray(np.pad(pt_idx_np, (0, Op - O)))
        obs_valid = jnp.asarray(np.arange(Op) < O)

        trr = TRUST_REGION_RADIUS_INIT

        f = core.compute_residuals(intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid)
        current_mse = float(core.compute_mse(f, O))
        self.status.initial_mse = current_mse
        self.status.final_mse = current_mse

        lm_iter = 0
        while True:
            if (lm_iter + 1 > opts.lm_min_iterations
                    and current_mse < opts.lm_mse_threshold):
                if opts.verbose_output:
                    print("BA: Satisfied MSE threshold.")
                break

            sys = core.build_system(
                intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid,
                mode=mode, fixed_intrinsics=opts.fixed_intrinsics)

            if mode == int(BundleMode.CAMERAS_AND_POINTS):
                delta_cam, delta_pt, pred, n_cg = core.solve_schur(
                    sys["Jc"], sys["Jp"], cam_idx, pt_idx,
                    sys["B"], sys["Cb"], sys["v"], sys["w"],
                    jnp.asarray(trr, dtype), cg_max_iter=opts.cg_max_iterations)
                n_cg = int(n_cg)
            elif mode == int(BundleMode.CAMERAS):
                delta_cam, pred, n_cg = core.solve_cameras_only(
                    sys["Jc"], cam_idx, sys["B"], sys["v"],
                    jnp.asarray(trr, dtype), cg_max_iter=opts.cg_max_iterations)
                delta_pt = jnp.zeros_like(points)
                n_cg = int(n_cg)
            else:  # POINTS
                delta_pt, pred = core.solve_points_only(
                    sys["Cb"], sys["w"], jnp.asarray(trr, dtype))
                delta_cam = jnp.zeros((intr.shape[0], 9), dtype)
                n_cg = 0

            # Trial update + new MSE.
            new_intr, new_trans, new_rot, new_points = core.apply_update(
                intr, trans, rot, points, delta_cam, delta_pt,
                fixed_intrinsics=opts.fixed_intrinsics)
            f_new = core.compute_residuals(
                new_intr, new_trans, new_rot, new_points, obs, cam_idx, pt_idx, obs_valid)
            new_mse = float(core.compute_mse(f_new, O))
            delta_mse = current_mse - new_mse
            delta_mse_ratio = 1.0 - new_mse / max(current_mse, 1e-300)
            self.status.num_cg_iterations += n_cg
            successful = delta_mse > 0.0

            if successful:
                if opts.verbose_output:
                    print(f"BA: #{lm_iter:2d} success, MSE {current_mse:.6e} -> "
                          f"{new_mse:.6e}, CG {n_cg:3d}, TRR {trr:g}")
                self.status.num_lm_iterations += 1
                self.status.num_lm_successful_iterations += 1
                intr, trans, rot, points = new_intr, new_trans, new_rot, new_points
                current_mse = new_mse
                pred_f = float(pred)
                gain_ratio = delta_mse * O / pred_f if pred_f != 0.0 else 1.0
                trust_update = 1.0 / max(1.0 / 3.0, 1.0 - (2.0 * gain_ratio - 1.0) ** 3)
                trr *= trust_update
            else:
                if opts.verbose_output:
                    print(f"BA: #{lm_iter:2d} failure, MSE {current_mse:.6e}, "
                          f"CG {n_cg:3d}, TRR {trr:g}")
                self.status.num_lm_iterations += 1
                self.status.num_lm_unsuccessful_iterations += 1
                trr *= TRUST_REGION_RADIUS_DECREMENT

            lm_iter += 1
            if lm_iter < opts.lm_min_iterations:
                continue
            if lm_iter >= opts.lm_max_iterations:
                if opts.verbose_output:
                    print(f"BA: Reached maximum LM iterations of {opts.lm_max_iterations}")
                break
            if successful and delta_mse_ratio < opts.lm_delta_threshold:
                if opts.verbose_output:
                    print(f"BA: Satisfied delta mse ratio threshold of {opts.lm_delta_threshold}")
                break

        self.status.final_mse = current_mse
        problem.update_from_arrays(
            np.asarray(intr)[:C].astype(np.float64),
            np.asarray(trans)[:C].astype(np.float64),
            np.asarray(rot)[:C].astype(np.float64),
            np.asarray(points)[:P].astype(np.float64),
        )

    def print_status(self) -> None:
        s = self.status
        print(f"BA: MSE {s.initial_mse} -> {s.final_mse}, "
              f"{s.num_lm_iterations} LM iters ({s.num_lm_successful_iterations} ok, "
              f"{s.num_lm_unsuccessful_iterations} fail), "
              f"{s.num_cg_iterations} CG iters, {s.runtime_ms} ms")
