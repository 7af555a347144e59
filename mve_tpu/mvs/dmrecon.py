"""Per-view depth map reconstruction driver (reference:
libs/dmrecon/dmrecon.cc).

Pipeline per reference view (same stages as DMRecon::start, :90-145):
  analyze features -> global view selection -> dense initialization from
  sparse features -> batched plane sweep + PatchMatch propagation +
  parabolic refinement (replacing sequential region growing,
  dmrecon.cc:334-434) -> write depth-L<s>/conf-L<s>/dz-L<s>/undist-L<s>
  embeddings with ray-length depths.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import image_tools
from ..core.scene import Scene
from .patch import ncc_score
from .settings import Settings
from .view_selection import global_view_selection


def _to_gray(img: np.ndarray) -> np.ndarray:
    f = image_tools.to_float(img)
    if f.shape[2] >= 3:
        return np.asarray(image_tools.desaturate(f, "luminance"))[:, :, 0]
    return f[:, :, 0]


def _level_dims(w: int, h: int, level: int):
    for _ in range(level):
        w = (w + 1) >> 1
        h = (h + 1) >> 1
    return w, h


def _image_at_level(img_gray: np.ndarray, level: int) -> np.ndarray:
    out = jnp.asarray(img_gray[:, :, None])
    for _ in range(level):
        out = image_tools.rescale_half_size_gaussian(out)
    return np.asarray(out)[:, :, 0]


def _fill_sparse(depth_sparse: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Dense completion of sparse seeds: pyramid downsample (valid mean)
    then coarse-to-fine fill of holes."""
    levels = [(depth_sparse, mask.astype(np.float64))]
    d, m = depth_sparse, mask.astype(np.float64)
    while d.shape[0] > 2 and d.shape[1] > 2:
        H2, W2 = (d.shape[0] + 1) // 2, (d.shape[1] + 1) // 2
        dpad = np.pad(d * m, ((0, d.shape[0] % 2), (0, d.shape[1] % 2)))
        mpad = np.pad(m, ((0, d.shape[0] % 2), (0, d.shape[1] % 2)))
        ds = dpad[0::2, 0::2] + dpad[1::2, 0::2] + dpad[0::2, 1::2] + dpad[1::2, 1::2]
        ms = mpad[0::2, 0::2] + mpad[1::2, 0::2] + mpad[0::2, 1::2] + mpad[1::2, 1::2]
        d = np.where(ms > 0, ds / np.maximum(ms, 1e-30), 0.0)
        m = (ms > 0).astype(np.float64)
        levels.append((d, m))
        if m.all():
            break
    # Coarse-to-fine: fill holes from the next-coarser level.
    d_coarse, m_coarse = levels[-1]
    if not m_coarse.all():
        fallback = d_coarse[m_coarse > 0].mean() if (m_coarse > 0).any() else 1.0
        d_coarse = np.where(m_coarse > 0, d_coarse, fallback)
    for d_fine, m_fine in reversed(levels[:-1]):
        up = np.repeat(np.repeat(d_coarse, 2, 0), 2, 1)[: d_fine.shape[0], : d_fine.shape[1]]
        d_coarse = np.where(m_fine > 0, d_fine, up)
    return d_coarse


def _plane_normals(depth, dzx, dzy, ray_world, r: int = 2) -> np.ndarray:
    """World-space patch-plane normals (patch_sampler.cc getPatchNormal).

    p(dx, dy) = cam_pos + (depth + dx dzI + dy dzJ) * ray(x+dx, y+dy);
    normal = normalize((p_right - p_left) x (p_top - p_bottom)).
    cam_pos cancels in the differences, so only rays are needed.
    """
    H, W = depth.shape
    rays = np.pad(ray_world, ((r, r), (r, r), (0, 0)), mode="edge")

    def p(dx, dy):
        L = depth + dx * dzx + dy * dzy
        return L[..., None] * rays[r + dy: r + dy + H, r + dx: r + dx + W]

    a = p(r, 0) - p(-r, 0)
    b = p(0, -r) - p(0, r)
    n = np.cross(a, b)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(norm, 1e-30)


class DMRecon:
    """Mirrors mvs::DMRecon (dmrecon.h:40-68)."""

    def __init__(self, scene: Scene, settings: Settings):
        from .progress import Progress

        self.scene = scene
        self.settings = settings
        self.filled_ratio = 0.0
        self.progress = Progress()

    def start(self) -> None:
        from .progress import ReconStatus

        self.progress.begin()
        s = self.settings
        scene = self.scene
        bundle = scene.get_bundle()
        views = scene.get_views()
        ref_view = views[s.ref_view_nr]
        if ref_view is None or not ref_view.camera.valid:
            raise ValueError(f"view {s.ref_view_nr} invalid")

        # --- gather bundle feature visibility (dmrecon.cc analyzeFeatures)
        positions = bundle.feature_positions()
        V = len(views)
        F = len(positions)
        vis = np.zeros((V, F), bool)
        for fi, feat in enumerate(bundle.features):
            inside = np.all(feat.pos >= s.aabb_min) and np.all(feat.pos <= s.aabb_max)
            if not inside:
                continue
            for ref in feat.refs:
                if 0 <= ref.view_id < V:
                    vis[ref.view_id, fi] = True

        cameras = [v.camera if v is not None else None for v in views]
        full_sizes = []
        for v in views:
            if v is None or not v.has_image(s.image_embedding):
                full_sizes.append((0, 0))
            else:
                full_sizes.append(v.get_image_size(s.image_embedding))

        # --- global view selection (global_view_selection.cc)
        self.progress.status = ReconStatus.GLOBALVS
        self.progress.check_cancelled()
        selected = global_view_selection(
            positions, vis, cameras, full_sizes, s.ref_view_nr,
            max_views=s.global_vs_max, min_parallax=s.min_parallax)
        selected = [v for v in selected
                    if views[v] is not None and views[v].has_image(s.image_embedding)]
        if len(selected) < s.nr_recon_neighbors:
            raise RuntimeError(
                f"view {s.ref_view_nr}: only {len(selected)} neighbors selected")

        # --- load images at working level (pyramid cache shares level
        # images across reference views, image_pyramid.cc cache).
        from .pyramid import ImagePyramidCache

        ref_img_full = ref_view.get_image(s.image_embedding)
        ref_level = ImagePyramidCache.get_level(
            scene, s.ref_view_nr, s.image_embedding, s.scale, _to_gray)
        H, W = ref_level.shape
        ref_cam = ref_view.camera
        ref_wh = (W, H)

        neigh_imgs = []
        Ts, ts = [], []
        for v in selected:
            g = ImagePyramidCache.get_level(scene, v, s.image_embedding, s.scale, _to_gray)
            neigh_imgs.append(g)
            w2, h2 = _level_dims(*full_sizes[v], s.scale)
            T, tv = ref_cam.reprojection(views[v].camera, ref_wh, (w2, h2))
            Ts.append(T)
            ts.append(tv)
        Hn = max(g.shape[0] for g in neigh_imgs)
        Wn = max(g.shape[1] for g in neigh_imgs)
        neigh = np.full((len(neigh_imgs), Hn, Wn), -1e3, np.float32)
        for j, g in enumerate(neigh_imgs):
            neigh[j, : g.shape[0], : g.shape[1]] = g

        # --- ray geometry for the reference view
        Ki = ref_cam.inverse_calibration(W, H)
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
        dirs = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=-1) @ Ki.T
        ray_norm = np.linalg.norm(dirs, axis=-1)
        ray_z = (dirs[..., 2] / ray_norm).astype(np.float32)  # z of unit ray

        # --- feature seeds: project features of the ref view, depth =
        # ray length (dmrecon.cc processFeatures seeds)
        self.progress.status = ReconStatus.FEATURES
        self.progress.check_cancelled()
        feat_ids = np.nonzero(vis[s.ref_view_nr])[0]
        seed_depth = np.zeros((H, W), np.float64)
        seed_mask = np.zeros((H, W), bool)
        if len(feat_ids):
            pts = positions[feat_ids]
            pc = (ref_cam.rot @ pts.T).T + ref_cam.trans
            K = ref_cam.calibration(W, H)
            proj = (K @ pc.T).T
            u = proj[:, 0] / proj[:, 2] - 0.5
            vpix = proj[:, 1] / proj[:, 2] - 0.5
            ray_len = np.linalg.norm(pc, axis=1)
            ok = (pc[:, 2] > 0) & (u >= 0) & (u < W) & (vpix >= 0) & (vpix < H)
            ui = np.round(u[ok]).astype(int)
            vi = np.round(vpix[ok]).astype(int)
            seed_depth[vi, ui] = ray_len[ok]
            seed_mask[vi, ui] = True
        if seed_mask.sum() < 3:
            raise RuntimeError(f"view {s.ref_view_nr}: too few feature seeds")

        dmin = float(seed_depth[seed_mask].min()) * 0.7
        dmax = float(seed_depth[seed_mask].max()) * 1.4
        init_depth = _fill_sparse(seed_depth, seed_mask).astype(np.float32)

        # --- world rays + camera centers for per-pixel view selection
        ray_world = (dirs / ray_norm[..., None]) @ ref_cam.rot  # R^T @ unit
        ref_pos = ref_cam.camera_pos()
        cam_pos = np.stack([views[v].camera.camera_pos() for v in selected])

        # --- batched optimization
        self.progress.status = ReconStatus.QUEUE
        self.progress.check_cancelled()
        depth, dzx, dzy, score, kth = self._optimize(
            jnp.asarray(ref_level, jnp.float32), jnp.asarray(neigh, jnp.float32),
            jnp.asarray(np.stack(Ts), jnp.float32), jnp.asarray(np.stack(ts), jnp.float32),
            jnp.asarray(ray_z), jnp.asarray(init_depth), dmin, dmax,
            jnp.asarray(ray_world, jnp.float32), jnp.asarray(ref_pos, jnp.float32),
            jnp.asarray(cam_pos, jnp.float32))
        depth = np.asarray(depth)
        dzx = np.asarray(dzx)
        dzy = np.asarray(dzy)
        score = np.asarray(score)
        kth = np.asarray(kth)

        # --- confidence + acceptance (patch_optimization.cc:130-131; the
        # per-neighbor rule at :216 requires every selected view >=
        # acceptNCC, i.e. the k-th best NCC).
        conf = (score - s.accept_ncc) / (1.0 - s.accept_ncc)
        conf = np.maximum(conf, 0.0)
        conf = np.where(kth >= s.accept_ncc, conf, 0.0)
        # Normal-vs-viewing-direction gate (computeConfidence,
        # patch_optimization.cc:133-142): the optimized patch plane's
        # normal must face the camera (-n . viewdir >= 0.2).
        normal = _plane_normals(depth, dzx, dzy, ray_world,
                                r=s.filter_width // 2)
        dotp = -np.sum(normal * ray_world, axis=-1)
        conf = np.where(dotp >= 0.2, conf, 0.0)
        accepted = conf > 0.0
        depth = np.where(accepted, depth, 0.0).astype(np.float32)
        self.filled_ratio = float(accepted.mean())
        self.progress.filled = int(accepted.sum())
        self.progress.status = ReconStatus.SAVING

        # --- write embeddings (dmrecon.cc:120-145)
        ref_view.set_image(f"depth-L{s.scale}", depth[:, :, None])
        if s.keep_conf_map:
            ref_view.set_image(f"conf-L{s.scale}", conf.astype(np.float32)[:, :, None])
        if s.keep_dz_map:
            # The optimized patch plane's (dzI, dzJ) — ray-length change
            # per pixel step (dmrecon.cc:314-315), not a post-hoc gradient.
            dz = np.stack([dzx, dzy], axis=-1).astype(np.float32)
            dz[~accepted] = 0.0
            ref_view.set_image(f"dz-L{s.scale}", dz)
        if s.scale != 0:
            lvl_img = np.asarray(_image_at_level_color(ref_img_full, s.scale))
            ref_view.set_image(f"undist-L{s.scale}", lvl_img)
        if s.write_ply_file:
            self._write_ply(ref_view, depth, ref_cam)
        self.progress.status = ReconStatus.IDLE
        self.progress.queue_size = 0
        if not s.quiet:
            print(f"View {s.ref_view_nr}: filled {100.0 * self.filled_ratio:.1f}% "
                  f"({len(selected)} neighbors)")

    # ------------------------------------------------------------------
    def _write_ply(self, ref_view, depth, ref_cam) -> None:
        """saveReconAsPly (dmrecon.cc:109-116, single_view.cc): triangulate
        the accepted depth map and write it to <ply_path>/."""
        import os

        from ..core import depthmap as dmod
        from ..core import mesh_io
        from ..core.mesh_tools import mesh_transform

        s = self.settings
        H, W = depth.shape
        invproj = ref_cam.inverse_calibration(W, H)
        mesh, _ = dmod.depthmap_triangulate(depth, invproj, dd_factor=5.0)
        mesh_transform(mesh, ref_cam.cam_to_world())
        os.makedirs(s.ply_path or ".", exist_ok=True)
        out = os.path.join(s.ply_path or ".",
                           f"view_{s.ref_view_nr:04d}-L{s.scale}.ply")
        mesh_io.save_mesh(mesh, out)

    # ------------------------------------------------------------------
    def _optimize(self, ref, neigh, T, tvec, ray_z, init_depth, dmin, dmax,
                  ray_world=None, ref_pos=None, cam_pos=None):
        """Plane sweep + propagation + parabolic refinement.

        Each round evaluates its whole candidate stack in ONE device
        dispatch (ncc_score_multi) — candidate counts are static so the
        number of compiled programs stays small. With local_vs, per-pixel
        diverse view selection (local_view_selection.cc) runs after the
        sweep and again mid-propagation; subsequent rounds score only the
        4 selected views, cutting inner-loop work by J/4.
        """
        from .patch import (ncc_per_view_box, ncc_score_box,
                            ncc_score_box_sel, ncc_score_multi)
        from .view_selection import local_view_selection

        s = self.settings
        fw = s.filter_width
        k = s.nr_recon_neighbors
        J = neigh.shape[0]
        use_local = (s.local_vs and not s.exact_ncc and ray_world is not None
                     and J > k)
        sel_state = {}

        def reselect(best_d):
            ncc = ncc_per_view_box(ref, neigh, T, tvec, ray_z, best_d,
                                   filter_width=fw)
            sel, valid = local_view_selection(
                ncc, best_d, ray_world, ref_pos, cam_pos, k=k,
                min_ncc=s.min_ncc, min_parallax=s.min_parallax)
            sel_state["sel"] = sel
            sel_state["valid"] = valid

        def score_fn(depths):
            if sel_state:
                return ncc_score_box_sel(ref, neigh, T, tvec, ray_z, depths,
                                         sel_state["sel"], sel_state["valid"],
                                         filter_width=fw)
            fn = ncc_score_multi if s.exact_ncc else ncc_score_box
            return fn(ref, neigh, T, tvec, ray_z, depths,
                      filter_width=fw, top_k=k)

        def best_of(best_d, best_s, best_k, cands):
            cs, ck = score_fn(jnp.stack(cands))
            all_s = jnp.concatenate([best_s[None], cs])
            all_k = jnp.concatenate([best_k[None], ck])
            all_d = jnp.concatenate([best_d[None], jnp.stack(cands)])
            pick = jnp.argmax(all_s, axis=0)
            d = jnp.take_along_axis(all_d, pick[None], axis=0)[0]
            sc = jnp.take_along_axis(all_s, pick[None], axis=0)[0]
            kk = jnp.take_along_axis(all_k, pick[None], axis=0)[0]
            return d, sc, kk

        best_d = init_depth
        s0, k0 = score_fn(best_d[None])
        best_s, best_k = s0[0], k0[0]

        # Global sweep: geometric fan around the initialization plus
        # absolute planes across [dmin, dmax] — one dispatch.
        n_planes = s.num_sweep_planes
        rel = np.geomspace(0.75, 1.3333, max(n_planes // 2, 2))
        absd = np.geomspace(max(dmin, 1e-4), dmax, max(n_planes - len(rel), 2))
        cands = [best_d * float(f) for f in rel]
        cands += [jnp.full_like(best_d, float(dv)) for dv in absd]
        best_d, best_s, best_k = best_of(best_d, best_s, best_k, cands)

        def switch_selection(best_d):
            # (Re)select views per pixel, then rescore the incumbent under
            # the new selection so later comparisons stay consistent.
            reselect(best_d)
            s1, k1 = score_fn(best_d[None])
            return s1[0], k1[0]

        if use_local:
            best_s, best_k = switch_selection(best_d)

        # PatchMatch-style propagation: all shifts + perturbations of a
        # round in one dispatch (depth-only, like the reference's first
        # iterations, patch_optimization.cc doAutoOptimization:176-180).
        shifts = ((0, 1), (0, -1), (1, 0), (-1, 0), (0, 3), (3, 0), (0, -3), (-3, 0))
        for it in range(s.num_propagation_iters):
            self.progress.queue_size = s.num_propagation_iters - it
            self.progress.check_cancelled()
            if use_local and it == s.num_propagation_iters // 2:
                # Mid-run refresh: depths have moved; failing views get
                # replaced (local_view_selection.cc replaceViews).
                best_s, best_k = switch_selection(best_d)
            eps = 0.05 * (0.5 ** it)
            cands = [jnp.roll(best_d, (dy, dx), axis=(0, 1)) for dy, dx in shifts]
            cands += [best_d * (1.0 - eps), best_d * (1.0 + eps)]
            best_d, best_s, best_k = best_of(best_d, best_s, best_k, cands)

        # Parabolic sub-candidate refinement (replaces the reference's
        # Gauss-Newton depth steps, patch_optimization.cc
        # optimizeDepthOnly).
        for step in range(s.num_refine_steps):
            eps = 0.02 * (0.5 ** step)
            d_lo = best_d * (1.0 - eps)
            d_hi = best_d * (1.0 + eps)
            both, _ = score_fn(jnp.stack([d_lo, d_hi]))
            s_lo, s_hi = both[0], both[1]
            denom = s_lo - 2.0 * best_s + s_hi
            offset = jnp.where(
                jnp.abs(denom) > 1e-12,
                jnp.clip(0.5 * (s_lo - s_hi) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom), -1.0, 1.0),
                0.0)
            cand = best_d * (1.0 + offset * eps)
            best_d, best_s, best_k = best_of(best_d, best_s, best_k, [cand, d_lo, d_hi])

        # --- joint depth+normal (slanted patch) optimization: the batched
        # equivalent of optimizeDepthAndNormal interleaved every 5th
        # iteration (patch_optimization.cc:184-200). Patches carry the
        # reference's (depth, dzI, dzJ) plane; candidates per round are
        # plane propagations from neighbors (depth extrapolated along the
        # neighbor's plane) plus slope and depth perturbations, scored by
        # plane-induced warps. Round budget comes from max_iterations;
        # early exit when the best mean-NCC improves by less than
        # min_refine_diff (the reference's convergence rule).
        from .patch import ncc_score_plane, ncc_score_plane_sel

        def plane_score_fn(ds, zxs, zys):
            if sel_state:
                return ncc_score_plane_sel(
                    ref, neigh, T, tvec, ray_z, ds, zxs, zys,
                    sel_state["sel"], sel_state["valid"], filter_width=fw)
            return ncc_score_plane(ref, neigh, T, tvec, ray_z, ds, zxs, zys,
                                   filter_width=fw, top_k=k)

        # Initialize slopes from the current depth surface (central
        # differences of ray length per pixel step). The cap bounds the
        # plane obliquity at ~80 degrees (|dz| <= 0.05 d per pixel for
        # typical focal lengths): steeper planes are geometrically
        # degenerate AND their chaotic warps destroy the gather locality
        # the TPU's memory system needs (measured 10x kernel slowdown
        # when depth-discontinuity gradients leak into the slopes).
        slope_cap = 0.05 * jnp.maximum(best_d, 1e-6)
        best_zx = (jnp.roll(best_d, -1, axis=1) - jnp.roll(best_d, 1, axis=1)) * 0.5
        best_zy = (jnp.roll(best_d, -1, axis=0) - jnp.roll(best_d, 1, axis=0)) * 0.5
        best_zx = jnp.clip(best_zx, -slope_cap, slope_cap)
        best_zy = jnp.clip(best_zy, -slope_cap, slope_cap)

        def plane_best_of(state, cands):
            bd, bzx, bzy, bs, bk = state
            ds = jnp.stack([c[0] for c in cands])
            zxs = jnp.stack([c[1] for c in cands])
            zys = jnp.stack([c[2] for c in cands])
            cs, ck = plane_score_fn(ds, zxs, zys)
            all_s = jnp.concatenate([bs[None], cs])
            all_k = jnp.concatenate([bk[None], ck])
            all_d = jnp.concatenate([bd[None], ds])
            all_zx = jnp.concatenate([bzx[None], zxs])
            all_zy = jnp.concatenate([bzy[None], zys])
            pick = jnp.argmax(all_s, axis=0)[None]
            take = lambda a: jnp.take_along_axis(a, pick, axis=0)[0]
            return (take(all_d), take(all_zx), take(all_zy),
                    take(all_s), take(all_k))

        # Rescore the incumbent under the plane kernel (zero-slope plane
        # == fronto-parallel patch, so scores stay comparable).
        s_pl, k_pl = plane_score_fn(best_d[None], jnp.zeros_like(best_d)[None],
                                    jnp.zeros_like(best_d)[None])
        state = (best_d, jnp.zeros_like(best_d), jnp.zeros_like(best_d),
                 s_pl[0], k_pl[0])
        init_cand = (best_d, best_zx, best_zy)
        n_plane_rounds = max(0, min(
            (s.max_iterations + 4) // 5,          # every-5th-iteration cadence
            s.max_iterations - s.num_propagation_iters))
        prev_mean = None
        for rnd in range(n_plane_rounds):
            eps = 0.3 * (0.5 ** rnd)
            bd, bzx, bzy, _, _ = state
            cap = 0.05 * jnp.maximum(bd, 1e-6)
            step = eps * jnp.maximum(bd, 1e-6) * 0.02
            clampz = lambda z: jnp.clip(z, -cap, cap)
            cands = []
            if rnd == 0:
                cands.append(init_cand)
            for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                # Plane propagation: neighbor's plane extrapolated to here.
                nd = jnp.roll(bd, (dy, dx), axis=(0, 1))
                nzx = jnp.roll(bzx, (dy, dx), axis=(0, 1))
                nzy = jnp.roll(bzy, (dy, dx), axis=(0, 1))
                cands.append((nd + dx * nzx + dy * nzy, nzx, nzy))
            cands += [
                (bd, clampz(bzx + step), bzy), (bd, clampz(bzx - step), bzy),
                (bd, bzx, clampz(bzy + step)), (bd, bzx, clampz(bzy - step)),
                (bd - step, bzx, bzy), (bd + step, bzx, bzy),
            ]
            state = plane_best_of(state, cands)
            mean_s = float(jnp.mean(jnp.maximum(state[3], 0.0)))
            if prev_mean is not None and mean_s - prev_mean < s.min_refine_diff:
                break
            prev_mean = mean_s

        best_d, best_zx, best_zy, best_s, best_k = state
        best_d = jnp.clip(best_d, dmin * 0.5, dmax * 2.0)
        return best_d, best_zx, best_zy, best_s, best_k


def _image_at_level_color(img: np.ndarray, level: int) -> np.ndarray:
    out = jnp.asarray(image_tools.to_float(img))
    for _ in range(level):
        out = image_tools.rescale_half_size_gaussian(out)
    return image_tools.to_byte(np.asarray(out))
