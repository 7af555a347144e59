"""Incremental SfM state machine (reference: libs/sfm/bundler_incremental.cc).

Host orchestration over device kernels: P3P RANSAC resectioning,
pair-exhaustive track triangulation, LM bundle adjustment (ba/), median
track-error pruning, survey registration and scene normalization. The
control flow (find_next_views ranking, 33% inlier threshold, track
backup/restore, BA cadence) replicates the reference.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ...core.bundle import Bundle, Feature2D, Feature3D
from ...core.camera import CameraInfo
from ..ba import (BAProblem, BACamera, BAObservation, BAOptions, BAPoint,
                  BundleAdjustment, BundleMode)
from ..pose import CameraPose
from ..ransac import RansacOptions, ransac_pose_p3p
from ..triangulate import triangulate_match
from .common import (FeatureReference, SurveyPoint, Track, Viewport,
                     undistort_feature, undistort_features)


@dataclasses.dataclass
class IncrementalOptions:
    """bundler_incremental.h:110-119 defaults."""

    pose_p3p_opts: RansacOptions = dataclasses.field(
        default_factory=lambda: RansacOptions(max_iterations=1000, threshold=0.005))
    track_error_threshold_factor: float = 10.0
    new_track_error_threshold: float = 0.01
    min_triangulation_angle: float = np.deg2rad(1.0)
    ba_fixed_intrinsics: bool = False
    # jax.sharding.Mesh for observation-sharded BA (parallel/
    # distributed_ba.lm_optimize_distributed); None = single device.
    ba_mesh: object = None
    verbose_output: bool = False
    verbose_ba: bool = False


class Incremental:
    def __init__(self, options: Optional[IncrementalOptions] = None):
        self.opts = options or IncrementalOptions()
        self.viewports: List[Viewport] = []
        self.tracks: List[Track] = []
        self.survey_points: Optional[List[SurveyPoint]] = None
        self.registered = False
        self.last_ba_status = None  # BAStatus of the most recent BA

    def initialize(self, viewports: List[Viewport], tracks: List[Track],
                   survey_points: Optional[List[SurveyPoint]] = None) -> None:
        self.viewports = viewports
        self.tracks = tracks
        self.survey_points = survey_points or None

    def is_initialized(self) -> bool:
        return bool(self.viewports)

    # ------------------------------------------------------------------
    def find_next_views(self) -> List[int]:
        """Rank unreconstructed views by number of valid observed tracks;
        keep those with > 6 (bundler_incremental.cc:55-87)."""
        counts = np.zeros(len(self.viewports), np.int64)
        for track in self.tracks:
            if not track.is_valid():
                continue
            for ref in track.features:
                if not self.viewports[ref.view_id].pose.is_valid():
                    counts[ref.view_id] += 1
        order = np.argsort(-counts, kind="stable")
        return [int(v) for v in order if counts[v] > 6]

    # ------------------------------------------------------------------
    def reconstruct_next_view(self, view_id: int) -> bool:
        """P3P-RANSAC resectioning with track backup of outliers
        (bundler_incremental.cc:92-190)."""
        vp = self.viewports[view_id]
        corr_3d, corr_2d, track_ids, feature_ids = [], [], [], []
        for fid, tid in enumerate(vp.track_ids):
            tid = int(tid)
            if tid < 0 or not self.tracks[tid].is_valid():
                continue
            corr_3d.append(self.tracks[tid].pos)
            corr_2d.append(vp.positions[fid])
            track_ids.append(tid)
            feature_ids.append(fid)
        if len(corr_3d) < 3:
            return False

        K = np.array([[vp.focal_length, 0, 0], [0, vp.focal_length, 0], [0, 0, 1.0]])
        try:
            result = ransac_pose_p3p(
                np.asarray(corr_3d), np.asarray(corr_2d), K, self.opts.pose_p3p_opts)
        except ValueError:
            return False

        if 3 * len(result.inliers) < len(corr_3d):
            if self.opts.verbose_output:
                print(f"Only {len(result.inliers)} 2D-3D inliers "
                      f"({100 * len(result.inliers) // len(corr_3d)}%). Skipping view.")
            return False

        # Back up outlier tracks for later restore.
        inlier_set = set(int(i) for i in result.inliers)
        for i, (tid, fid) in enumerate(zip(track_ids, feature_ids)):
            if i in inlier_set:
                continue
            self.tracks[tid].remove_view(view_id)
            vp.track_ids[fid] = -1
            vp.backup_tracks[fid] = tid

        pose = CameraPose()
        pose.set_k_matrix(vp.focal_length, 0.0, 0.0)
        pose.R = result.R
        pose.t = result.t
        vp.pose = pose
        if self.opts.verbose_output:
            print(f"Reconstructed camera {view_id} with focal length "
                  f"{pose.get_focal_length():.5f}")

        if self.survey_points is not None and not self.registered:
            self.try_registration()
        return True

    # ------------------------------------------------------------------
    def try_restore_tracks_for_views(self) -> None:
        """Re-attach backed-up tracks whose reprojection now fits
        (bundler_incremental.cc:194-229)."""
        for view_id, vp in enumerate(self.viewports):
            if not vp.pose.is_valid():
                continue
            P = vp.pose.fill_p_matrix()
            for fid, tid in list(vp.backup_tracks.items()):
                if tid < 0 or not self.tracks[tid].is_valid() or vp.track_ids[fid] >= 0:
                    continue
                pos3d = self.tracks[tid].pos
                pos2d = undistort_feature(
                    vp.positions[fid], float(vp.radial_distortion[0]),
                    float(vp.radial_distortion[1]), vp.focal_length)
                proj = P @ np.append(pos3d, 1.0)
                cam_pt = proj[:2] / proj[2]
                if np.linalg.norm(cam_pt - pos2d) < self.opts.new_track_error_threshold:
                    vp.track_ids[fid] = tid
                    self.tracks[tid].features.append(FeatureReference(view_id, fid))

    # ------------------------------------------------------------------
    def triangulate_new_tracks(self, min_num_views: int = 2) -> None:
        """Pair-exhaustive triangulation with outlier splitting
        (bundler_incremental.cc:300-380, triangulate.cc Triangulate).

        Vectorized: all candidate tracks' pose pairs triangulate in one
        batched DLT; per-pair outlier evaluation over padded view lists;
        best pair per track selected by fewest outliers.
        """
        error_thr = self.opts.new_track_error_threshold
        cos_angle_thr = np.cos(self.opts.min_triangulation_angle)
        n_tracks_before = len(self.tracks)

        # ---- collect candidate tracks and their valid observations.
        cand_tracks = []   # track index
        obs_views = []     # list of arrays of view ids
        obs_feats = []
        obs_pos = []       # list of (V_i, 2) undistorted positions
        valid_pose = np.array([vp.pose.is_valid() for vp in self.viewports])
        und_cache = {}
        for ti in range(n_tracks_before):
            track = self.tracks[ti]
            if track.is_valid() or not track.features:
                continue
            vids = np.array([r.view_id for r in track.features], np.int64)
            fids = np.array([r.feature_id for r in track.features], np.int64)
            ok = valid_pose[vids]
            if int(ok.sum()) < min_num_views:
                continue
            vids, fids = vids[ok], fids[ok]
            ps = []
            for vid, fid in zip(vids, fids):
                vp = self.viewports[vid]
                key = vid
                if key not in und_cache:
                    und_cache[key] = undistort_features(
                        vp.positions, float(vp.radial_distortion[0]),
                        float(vp.radial_distortion[1]), vp.focal_length)
                ps.append(und_cache[key][fid])
            cand_tracks.append(ti)
            obs_views.append(vids)
            obs_feats.append(fids)
            obs_pos.append(np.asarray(ps, np.float64))
        if not cand_tracks:
            if self.opts.verbose_output:
                print("Triangulated 0 new tracks.")
            return

        pmats = {i: vp.pose.fill_p_matrix() for i, vp in enumerate(self.viewports)
                 if valid_pose[i]}
        centers = {i: vp.pose.fill_camera_pos() for i, vp in enumerate(self.viewports)
                   if valid_pose[i]}

        # ---- flatten all pose pairs of all candidate tracks.
        rows_t, rows_pa, rows_pb = [], [], []
        Pa, Pb, Ca, Cb = [], [], [], []
        for ci, (vids, ps) in enumerate(zip(obs_views, obs_pos)):
            V = len(vids)
            for a in range(V):
                for b in range(a + 1, V):
                    rows_t.append(ci)
                    rows_pa.append(ps[a])
                    rows_pb.append(ps[b])
                    Pa.append(pmats[vids[a]])
                    Pb.append(pmats[vids[b]])
                    Ca.append(centers[vids[a]])
                    Cb.append(centers[vids[b]])
        rows_t = np.array(rows_t, np.int64)
        pa = np.asarray(rows_pa)
        pb = np.asarray(rows_pb)
        Pa = np.asarray(Pa)
        Pb = np.asarray(Pb)
        Ca = np.asarray(Ca)
        Cb = np.asarray(Cb)
        R = len(rows_t)

        # ---- batched two-view DLT (numpy; 4x4 SVDs are host-cheap).
        A = np.stack([
            pa[:, 0, None] * Pa[:, 2] - Pa[:, 0],
            pa[:, 1, None] * Pa[:, 2] - Pa[:, 1],
            pb[:, 0, None] * Pb[:, 2] - Pb[:, 0],
            pb[:, 1, None] * Pb[:, 2] - Pb[:, 1],
        ], axis=1)  # (R, 4, 4)
        _, _, vt = np.linalg.svd(A)
        Xh = vt[:, -1, :]
        w = Xh[:, 3]
        X = Xh[:, :3] / np.where(np.abs(w[:, None]) < 1e-30, 1e-30, w[:, None])
        finite = np.isfinite(X).all(axis=1)

        # Angle check.
        r0 = X - Ca
        r1 = X - Cb
        n0 = np.linalg.norm(r0, axis=1)
        n1 = np.linalg.norm(r1, axis=1)
        cosang = np.sum(r0 * r1, axis=1) / np.maximum(n0 * n1, 1e-30)
        angle_ok = cosang <= cos_angle_thr

        # ---- outlier counts: project X of each row into every view of
        # its track (padded).
        Vmax = max(len(v) for v in obs_views)
        pad_P = np.zeros((len(cand_tracks), Vmax, 3, 4))
        pad_obs = np.zeros((len(cand_tracks), Vmax, 2))
        pad_valid = np.zeros((len(cand_tracks), Vmax), bool)
        for ci, (vids, ps) in enumerate(zip(obs_views, obs_pos)):
            for k, vid in enumerate(vids):
                pad_P[ci, k] = pmats[vid]
                pad_obs[ci, k] = ps[k]
                pad_valid[ci, k] = True
        rp = pad_P[rows_t]        # (R, Vmax, 3, 4)
        robs = pad_obs[rows_t]
        rvalid = pad_valid[rows_t]
        Xh1 = np.concatenate([X, np.ones((R, 1))], axis=1)
        proj = np.einsum("rvij,rj->rvi", rp, Xh1)
        behind = proj[..., 2] <= 0.0
        uv = proj[..., :2] / np.where(np.abs(proj[..., 2:]) < 1e-30, 1e-30, proj[..., 2:])
        err = np.linalg.norm(uv - robs, axis=-1)
        outlier = (behind | (err > error_thr)) & rvalid
        n_out = outlier.sum(axis=1)
        usable = finite & angle_ok
        n_out_eff = np.where(usable, n_out, Vmax + 1)

        # ---- best pair per track.
        order = np.lexsort((n_out_eff, rows_t))
        first = np.ones(len(order), bool)
        first[1:] = rows_t[order][1:] != rows_t[order][:-1]
        best_rows = order[first]

        n_new = 0
        for row in best_rows:
            ci = int(rows_t[row])
            if not usable[row]:
                continue
            vids = obs_views[ci]
            fids = obs_feats[ci]
            V = len(vids)
            outs = np.nonzero(outlier[row][:V])[0]
            if V < len(outs) + min_num_views:
                continue
            ti = cand_tracks[ci]
            track = self.tracks[ti]
            track.pos = X[row].copy()
            n_new += 1
            if len(outs):
                new_track = Track()
                new_track.invalidate()
                new_track.color = track.color.copy()
                for oi in outs:
                    vid, fid = int(vids[oi]), int(fids[oi])
                    track.remove_view(vid)
                    new_track.features.append(FeatureReference(vid, fid))
                    self.viewports[vid].track_ids[fid] = len(self.tracks)
                self.tracks.append(new_track)
        if self.opts.verbose_output:
            print(f"Triangulated {n_new} new tracks, split "
                  f"{len(self.tracks) - n_tracks_before}.")

    # ------------------------------------------------------------------
    def bundle_adjustment_full(self) -> None:
        self._bundle_adjustment_intern(-1)

    def bundle_adjustment_single_cam(self, view_id: int) -> None:
        if (view_id < 0 or view_id >= len(self.viewports)
                or not self.viewports[view_id].pose.is_valid()):
            raise ValueError("Invalid view ID")
        self._bundle_adjustment_intern(view_id)

    def bundle_adjustment_points_only(self) -> None:
        self._bundle_adjustment_intern(-2)

    def _bundle_adjustment_intern(self, single_camera_ba: int) -> None:
        """Map viewports/tracks to the BA problem and back
        (bundler_incremental.cc:416-575)."""
        opts = BAOptions(
            fixed_intrinsics=self.opts.ba_fixed_intrinsics,
            mesh=self.opts.ba_mesh,
            verbose_output=self.opts.verbose_ba)
        if single_camera_ba >= 0:
            opts.bundle_mode = BundleMode.CAMERAS
        elif single_camera_ba == -2:
            opts.bundle_mode = BundleMode.POINTS
        else:
            opts.bundle_mode = BundleMode.CAMERAS_AND_POINTS

        cameras: List[BACamera] = []
        cam_mapping = np.full(len(self.viewports), -1, np.int64)
        for i, vp in enumerate(self.viewports):
            if single_camera_ba >= 0 and i != single_camera_ba:
                continue
            if not vp.pose.is_valid():
                continue
            cam_mapping[i] = len(cameras)
            cameras.append(BACamera(
                focal_length=vp.pose.get_focal_length(),
                distortion=vp.radial_distortion.copy(),
                translation=vp.pose.t.copy(),
                rotation=vp.pose.R.copy()))

        points: List[BAPoint] = []
        observations: List[BAObservation] = []
        track_mapping = np.full(len(self.tracks), -1, np.int64)
        for i, track in enumerate(self.tracks):
            if not track.is_valid():
                continue
            track_mapping[i] = len(points)
            points.append(BAPoint(pos=track.pos.copy()))
            for ref in track.features:
                if not self.viewports[ref.view_id].pose.is_valid():
                    continue
                if single_camera_ba >= 0 and ref.view_id != single_camera_ba:
                    continue
                pos2d = self.viewports[ref.view_id].positions[ref.feature_id]
                observations.append(BAObservation(
                    np.asarray(pos2d, np.float64).copy(),
                    int(cam_mapping[ref.view_id]), int(track_mapping[i])))

        if self.survey_points is not None and self.registered:
            for sp in self.survey_points:
                points.append(BAPoint(pos=sp.pos.copy(), is_constant=True))
                for obs in sp.observations:
                    if not self.viewports[obs.view_id].pose.is_valid():
                        continue
                    if single_camera_ba >= 0 and obs.view_id != single_camera_ba:
                        continue
                    observations.append(BAObservation(
                        np.asarray(obs.pos, np.float64).copy(),
                        int(cam_mapping[obs.view_id]), len(points) - 1))

        if not cameras or not points or not observations:
            return

        problem = BAProblem(cameras, points, observations)
        ba = BundleAdjustment(opts)
        ba.optimize(problem)
        self.last_ba_status = ba.status
        if self.opts.verbose_output:
            ba.print_status()

        # Transfer cameras back.
        for i, vp in enumerate(self.viewports):
            if cam_mapping[i] < 0:
                continue
            cam = cameras[int(cam_mapping[i])]
            vp.pose.t = cam.translation.copy()
            vp.pose.R = cam.rotation.copy()
            vp.radial_distortion[:] = cam.distortion
            vp.pose.set_k_matrix(cam.focal_length, 0.0, 0.0)

        if single_camera_ba >= 0:
            return
        # Transfer tracks back.
        for i, track in enumerate(self.tracks):
            if track_mapping[i] < 0:
                continue
            track.pos = points[int(track_mapping[i])].pos.copy()

    # ------------------------------------------------------------------
    def invalidate_large_error_tracks(self) -> None:
        """Drop tracks whose mean squared reprojection error exceeds
        factor x median error (bundler_incremental.cc:578-655)."""
        # Flatten all (track, observation) pairs and evaluate vectorized.
        valid_pose = np.array([vp.pose.is_valid() for vp in self.viewports])
        obs_t, obs_v, obs_f = [], [], []
        track_ids = []
        for i, track in enumerate(self.tracks):
            if not track.is_valid():
                continue
            track_ids.append(i)
            for ref in track.features:
                if valid_pose[ref.view_id]:
                    obs_t.append(len(track_ids) - 1)
                    obs_v.append(ref.view_id)
                    obs_f.append(ref.feature_id)
        if len(track_ids) < 2 or not obs_t:
            return
        obs_t = np.array(obs_t)
        obs_v = np.array(obs_v)
        obs_f = np.array(obs_f)
        T = len(track_ids)
        pos3d = np.array([self.tracks[i].pos for i in track_ids])
        Rm = np.array([self.viewports[v].pose.R for v in obs_v])
        tv = np.array([self.viewports[v].pose.t for v in obs_v])
        flen = np.array([self.viewports[v].pose.get_focal_length() for v in obs_v])
        k0 = np.array([self.viewports[v].radial_distortion[0] for v in obs_v])
        k1 = np.array([self.viewports[v].radial_distortion[1] for v in obs_v])
        p2d = np.array([self.viewports[v].positions[f] for v, f in zip(obs_v, obs_f)],
                       np.float64)
        x = np.einsum("oij,oj->oi", Rm, pos3d[obs_t]) + tv
        x2d = x[:, :2] / np.where(np.abs(x[:, 2:]) < 1e-30, 1e-30, x[:, 2:])
        r2 = np.sum(x2d * x2d, axis=1)
        factor = (1.0 + r2 * (k0 + k1 * r2)) * flen
        d = p2d - x2d * factor[:, None]
        sq = np.sum(d * d, axis=1)
        total = np.zeros(T)
        count = np.zeros(T)
        np.add.at(total, obs_t, sq)
        np.add.at(count, obs_t, 1)
        ok = count > 0
        errs = total[ok] / count[ok]
        all_errors = list(zip(errs, np.array(track_ids)[ok]))
        nth = len(errs) // 2
        median = np.partition(errs, nth)[nth]
        threshold = median * self.opts.track_error_threshold_factor
        n_deleted = 0
        for err, ti in all_errors:
            if err > threshold:
                self.tracks[ti].invalidate()
                n_deleted += 1
        if self.opts.verbose_output:
            print(f"Deleted {n_deleted} of {len(all_errors)} tracks above "
                  f"threshold {np.sqrt(threshold):.6f}.")

    # ------------------------------------------------------------------
    def try_registration(self) -> None:
        """Similarity-align to survey points (bundler_incremental.cc:234-297)."""
        p0, p1 = [], []
        for sp in self.survey_points or []:
            pos, poses = [], []
            for obs in sp.observations:
                if not self.viewports[obs.view_id].pose.is_valid():
                    continue
                pos.append(obs.pos)
                poses.append(self.viewports[obs.view_id].pose)
            if len(pos) < 2:
                continue
            X = _triangulate_nview(poses, pos)
            p0.append(X)
            p1.append(sp.pos)
        if len(p0) < 3:
            return
        transform = _determine_similarity(np.asarray(p0), np.asarray(p1))
        if transform is None:
            return
        R, s, t = transform
        for vp in self.viewports:
            if not vp.pose.is_valid():
                continue
            vp.pose.t = -vp.pose.R @ R.T @ t + vp.pose.t * s
            vp.pose.R = vp.pose.R @ R.T
        for track in self.tracks:
            if track.is_valid():
                track.pos = R @ (s * track.pos) + t
        self.registered = True

    # ------------------------------------------------------------------
    def normalize_scene(self) -> None:
        """Center camera mean, scale AABB of camera centers to 10
        (bundler_incremental.cc:657-717)."""
        self.registered = False
        centers = []
        for vp in self.viewports:
            if vp.pose.is_valid():
                centers.append(vp.pose.fill_camera_pos())
        if not centers:
            return
        centers = np.asarray(centers)
        aabb_min = centers.min(axis=0)
        aabb_max = centers.max(axis=0)
        scale = 10.0 / max((aabb_max - aabb_min).max(), 1e-30)
        trans = -centers.mean(axis=0)
        for track in self.tracks:
            if track.is_valid():
                track.pos = (track.pos + trans) * scale
        for vp in self.viewports:
            if vp.pose.is_valid():
                vp.pose.t = vp.pose.t * scale - vp.pose.R @ trans * scale

    # ------------------------------------------------------------------
    def create_bundle(self) -> Bundle:
        """Export to an mve Bundle (bundler_incremental.cc:752-828)."""
        bundle = Bundle()
        for vp in self.viewports:
            cam = CameraInfo()
            if vp.pose.is_valid():
                cam.flen = float(vp.pose.get_focal_length())
                cam.ppoint = np.array([vp.pose.K[0, 2] + 0.5, vp.pose.K[1, 2] + 0.5], np.float32)
                cam.rot = vp.pose.R.astype(np.float32)
                cam.trans = vp.pose.t.astype(np.float32)
                cam.dist = vp.radial_distortion.astype(np.float32)
            bundle.cameras.append(cam)
        for track in self.tracks:
            if not track.is_valid():
                continue
            refs = []
            for ref in track.features:
                pos2d = self.viewports[ref.view_id].positions[ref.feature_id]
                refs.append(Feature2D(ref.view_id, ref.feature_id,
                                      np.asarray(pos2d, np.float32).copy()))
            bundle.features.append(Feature3D(
                track.pos.astype(np.float32),
                track.color.astype(np.float32) / 255.0,
                refs))
        return bundle


# ---------------------------------------------------------------------------
# triangulation helpers
# ---------------------------------------------------------------------------

def _triangulate_nview(poses: List[CameraPose], positions) -> np.ndarray:
    """Plain N-view DLT (triangulate.cc triangulate_track)."""
    rows = []
    for pose, p in zip(poses, positions):
        P = pose.fill_p_matrix()
        rows.append(p[0] * P[2] - P[0])
        rows.append(p[1] * P[2] - P[1])
    A = np.asarray(rows)
    _, _, vt = np.linalg.svd(A)
    X = vt[-1]
    return X[:3] / X[3]


def _determine_similarity(p0: np.ndarray, p1: np.ndarray):
    """Horn similarity transform p1 ~= s R p0 + t (math/transform.h
    determine_transform). Returns (R, s, t) or None."""
    c0 = p0.mean(axis=0)
    c1 = p1.mean(axis=0)
    q0 = p0 - c0
    q1 = p1 - c1
    H = q0.T @ q1
    u, sv, vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    D = np.diag([1.0, 1.0, d])
    R = vt.T @ D @ u.T
    denom = np.sum(q0 * q0)
    if denom < 1e-30:
        return None
    s = np.sum(sv * np.diag(D)) / denom
    t = c1 - s * R @ c0
    return R, s, t
