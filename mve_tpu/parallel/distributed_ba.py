"""Distributed bundle adjustment step (SURVEY.md §2.9 / BASELINE.json
north star: camera/point blocks replicated, observations sharded, the
reduced camera system reduced via psum over ICI).

The observation tensors (obs, cam_idx, pt_idx, valid) are sharded along
their leading axis over the mesh's "data" axis; cameras/points are
replicated. Everything inside one jit: XLA turns the segment-sums in
build_system and in each CG iteration's S*y product into psums across
the mesh — this is the NCCL-equivalent path, expressed as shardings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sfm.ba import core as ba_core
from .mesh import shard_batch, replicate


@functools.partial(jax.jit, static_argnames=("cg_max_iter", "fixed_intrinsics"))
def _ba_step(intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid, trr,
             cg_max_iter: int = 100, fixed_intrinsics: bool = False):
    """One LM linear step: build the system, solve the Schur complement,
    apply the update, return new params + diagnostics."""
    sys = ba_core.build_system(
        intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid,
        mode=3, fixed_intrinsics=fixed_intrinsics)
    delta_cam, delta_pt, pred, n_cg = ba_core.solve_schur(
        sys["Jc"], sys["Jp"], cam_idx, pt_idx,
        sys["B"], sys["Cb"], sys["v"], sys["w"], trr,
        cg_max_iter=cg_max_iter)
    new_intr, new_trans, new_rot, new_points = ba_core.apply_update(
        intr, trans, rot, points, delta_cam, delta_pt,
        fixed_intrinsics=fixed_intrinsics)
    f_new = ba_core.compute_residuals(
        new_intr, new_trans, new_rot, new_points, obs, cam_idx, pt_idx, obs_valid)
    new_mse = ba_core.compute_mse(f_new, jnp.sum(obs_valid))
    return new_intr, new_trans, new_rot, new_points, new_mse, pred, n_cg


def lm_optimize_distributed(mesh: Mesh, intr, trans, rot, points,
                            obs, cam_idx, pt_idx, obs_valid, num_valid,
                            **opts):
    """The FULL LM trust-region loop (ba_core.lm_optimize_device) with
    observations sharded over `mesh` and parameters replicated.

    Same compiled program as the single-device loop — the shardings make
    XLA lower every segment-sum (Hessian block assembly, the E/E^T
    products inside each CG iteration) into a local partial sum plus a
    psum over the mesh axis, i.e. one all-reduce per CG matvec riding
    ICI. The observation axis must be padded to a multiple of the mesh
    size (lm.py's power-of-two buckets already are).

    Returns (intr, trans, rot, points, status) with replicated outputs.
    """
    intr = replicate(mesh, intr)
    trans = replicate(mesh, trans)
    rot = replicate(mesh, rot)
    points = replicate(mesh, points)
    obs = shard_batch(mesh, obs)
    cam_idx = shard_batch(mesh, cam_idx)
    pt_idx = shard_batch(mesh, pt_idx)
    obs_valid = shard_batch(mesh, obs_valid)
    return ba_core.lm_optimize_device(
        intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid,
        num_valid, **opts)


def distributed_ba_step(mesh: Mesh, intr, trans, rot, points,
                        obs, cam_idx, pt_idx, obs_valid, trr,
                        cg_max_iter: int = 100):
    """Run one BA LM step with observations sharded over `mesh`.

    Returns (intr, trans, rot, points, mse) with replicated outputs.
    """
    intr = replicate(mesh, intr)
    trans = replicate(mesh, trans)
    rot = replicate(mesh, rot)
    points = replicate(mesh, points)
    obs = shard_batch(mesh, obs)
    cam_idx = shard_batch(mesh, cam_idx)
    pt_idx = shard_batch(mesh, pt_idx)
    obs_valid = shard_batch(mesh, obs_valid)
    trr = replicate(mesh, trr)
    out = _ba_step(intr, trans, rot, points, obs, cam_idx, pt_idx, obs_valid,
                   trr, cg_max_iter=cg_max_iter)
    return out[:5]
