"""Fused batched MVS solver: the WHOLE per-view optimization as one XLA
program, vmapped over reference views.

The reference reconstructs each view with a sequential priority-queue
region grower whose inner loop is per-pixel NCC patch optimization
(libs/dmrecon/dmrecon.cc:334-434, patch_optimization.cc). Round 2 of this
framework recast that as batched per-pixel rounds but dispatched each
round's candidate stack as a separate device program from Python — on a
remote-attached TPU every dispatch pays a host round-trip, so ~400 tiny
dispatches per view cost ~2.4s while the device itself computed for ~5ms.

This module fuses ALL stages — plane sweep, per-pixel local view
selection (local_view_selection.cc performVS), PatchMatch propagation,
parabolic refinement, joint depth+normal (slanted plane) rounds with the
reference's convergence rule, and confidence/acceptance
(patch_optimization.cc computeConfidence) — into ONE jitted function
using lax.scan for the round loops, then vmaps it over a batch of
reference views (the batched analog of the reference's OpenMP view loop,
apps/dmrecon/dmrecon.cc:285). One dispatch reconstructs every view in
the batch.

Neighbor sets are padded to a common J with a validity mask so views
with different global selections share one compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .patch import _box_sum, _warp_bilinear, _plane_tap_sums, make_patch_offsets


# -----------------------------------------------------------------------
# scoring primitives (traced, composed into the fused program)
# -----------------------------------------------------------------------

def _ref_box_stats(ref, fw):
    n_taps = fw * fw
    sum_r = _box_sum(ref, fw)
    sum_rr = _box_sum(ref * ref, fw)
    mean_r = sum_r / n_taps
    var_r = sum_rr / n_taps - mean_r * mean_r
    return mean_r, var_r


def _ncc_box_all(ref, rstats, neigh, nvalid, T, tvec, ray_z, depths, fw):
    """Box-NCC of every neighbor for a candidate stack.

    depths: (K, H, W) ray lengths -> (ncc (J, K, H, W), ok (J, K, H, W)).
    """
    H, W = ref.shape
    J = neigh.shape[0]
    n_taps = fw * fw
    mean_r, var_r = rstats
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    z = depths * ray_z[None]                                  # (K, H, W)
    u0i, v0i, fu, fv, inb = _warp_bilinear(
        neigh, T[:, None, None, None], tvec[:, None, None, None],
        z[None], xs + 0.5, ys + 0.5)                          # (J, K, H, W)
    jidx = jnp.arange(J)[:, None, None, None]
    p00 = neigh[jidx, v0i, u0i]
    p01 = neigh[jidx, v0i, u0i + 1]
    p10 = neigh[jidx, v0i + 1, u0i]
    p11 = neigh[jidx, v0i + 1, u0i + 1]
    nv = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
          + p10 * (1 - fu) * fv + p11 * fu * fv)
    inb = inb & (depths > 0)[None]
    nv = jnp.where(inb, nv, 0.0)
    cnt = _box_sum(inb.astype(jnp.float32), fw)
    full = cnt >= n_taps - 0.5
    sum_n = _box_sum(nv, fw)
    sum_nn = _box_sum(nv * nv, fw)
    sum_rn = _box_sum(nv * ref[None, None], fw)
    mean_n = sum_n / n_taps
    var_n = sum_nn / n_taps - mean_n * mean_n
    cov = sum_rn / n_taps - mean_r[None, None] * mean_n
    denom = jnp.sqrt(jnp.maximum(var_r[None, None] * var_n, 1e-12))
    ok = full & nvalid[:, None, None, None]
    ncc = jnp.where(ok, cov / denom, -1.0)
    return ncc, ok


def _ncc_box_sel(ref, rstats, neigh, T, tvec, ray_z, depths, sel, sel_valid, fw):
    """Box-NCC over per-pixel SELECTED views: (S, K, H, W)."""
    H, W = ref.shape
    n_taps = fw * fw
    mean_r, var_r = rstats
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    z = depths * ray_z[None]                                  # (K, H, W)
    Tg = T[sel]                                               # (S, H, W, 3, 3)
    tg = tvec[sel]                                            # (S, H, W, 3)
    u0i, v0i, fu, fv, inb = _warp_bilinear(
        neigh, Tg[:, None], tg[:, None], z[None], xs + 0.5, ys + 0.5)
    jidx = sel[:, None]
    p00 = neigh[jidx, v0i, u0i]
    p01 = neigh[jidx, v0i, u0i + 1]
    p10 = neigh[jidx, v0i + 1, u0i]
    p11 = neigh[jidx, v0i + 1, u0i + 1]
    nv = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
          + p10 * (1 - fu) * fv + p11 * fu * fv)
    inb = inb & (depths > 0)[None]
    nv = jnp.where(inb, nv, 0.0)
    cnt = _box_sum(inb.astype(jnp.float32), fw)
    full = cnt >= n_taps - 0.5
    sum_n = _box_sum(nv, fw)
    sum_nn = _box_sum(nv * nv, fw)
    sum_rn = _box_sum(nv * ref[None, None], fw)
    mean_n = sum_n / n_taps
    var_n = sum_nn / n_taps - mean_n * mean_n
    cov = sum_rn / n_taps - mean_r[None, None] * mean_n
    denom = jnp.sqrt(jnp.maximum(var_r[None, None] * var_n, 1e-12))
    ok = full & sel_valid[:, None]
    ncc = jnp.where(ok, cov / denom, -1.0)
    return ncc, ok


def _combine_topk(ncc, ok, k):
    """Mean of top-k NCC per pixel, gated on >= k usable views."""
    J = ncc.shape[0]
    kk = min(k, J)
    top = jax.lax.top_k(jnp.moveaxis(ncc, 0, -1), kk)[0]
    n_valid = jnp.sum(ok, axis=0)
    score = jnp.mean(top, axis=-1)
    kth = top[..., -1]
    score = jnp.where(n_valid >= kk, score, -1.0)
    kth = jnp.where(n_valid >= kk, kth, -1.0)
    return score, kth


def _combine_sel(ncc, ok):
    """Mean over selected views, gated on ALL selected views usable."""
    S = ncc.shape[0]
    n_ok = jnp.sum(ok, axis=0)
    score = jnp.sum(jnp.where(ok, ncc, 0.0), axis=0) / jnp.maximum(n_ok, 1)
    kth = jnp.min(jnp.where(ok, ncc, 1.0), axis=0)
    score = jnp.where(n_ok >= S, score, -1.0)
    kth = jnp.where(n_ok >= S, kth, -1.0)
    return score, kth


def _ncc_plane_all(ref, neigh, nvalid, T, tvec, ray_z, depths, dzx, dzy, fw, k):
    J = neigh.shape[0]
    jidx = jnp.arange(J)[:, None, None, None]

    def gather(v0i, u0i):
        return neigh[jidx, v0i, u0i]

    ncc, valid = _plane_tap_sums(
        ref, neigh, T[:, None, None, None], tvec[:, None, None, None],
        gather, ray_z, depths, dzx, dzy, fw, (J,))
    ok = valid & nvalid[:, None, None, None]
    ncc = jnp.where(ok, ncc, -1.0)
    return _combine_topk(ncc, ok, k)


def _ncc_plane_sel(ref, neigh, T, tvec, ray_z, depths, dzx, dzy,
                   sel, sel_valid, fw):
    S = sel.shape[0]
    Tg = T[sel]
    tg = tvec[sel]
    jidx = sel[:, None]

    def gather(v0i, u0i):
        return neigh[jidx, v0i, u0i]

    ncc, valid = _plane_tap_sums(
        ref, neigh, Tg[:, None], tg[:, None], gather, ray_z,
        depths, dzx, dzy, fw, (S,))
    ok = valid & sel_valid[:, None]
    ncc = jnp.where(ok, ncc, -1.0)
    return _combine_sel(ncc, ok)


# -----------------------------------------------------------------------
# local view selection (local_view_selection.cc performVS) on relative
# camera positions, with a neighbor validity mask
# -----------------------------------------------------------------------

def _parallax_weight(cos_ang):
    """parallaxToWeight (mvs_tools.h:56-69): Gaussian peaked at 20 deg."""
    plx = jnp.degrees(jnp.arccos(jnp.clip(cos_ang, -1.0, 1.0)))
    sigma = jnp.where(plx <= 20.0, 5.0, 15.0)
    return jnp.exp(-((plx - 20.0) ** 2) / (2.0 * sigma * sigma))


def _topk_views(ncc, nvalid, k):
    """Per-pixel k best views by raw NCC (no quality/parallax gates).

    The OPTIMIZATION fallback where the strict local view selection
    fails: a pixel whose current depth estimate is wrong has no views
    with NCC >= min_ncc, so the strict selection is empty and every
    candidate would score -1 — PatchMatch could then never test the
    good depths its neighbors propagate in. Scoring through the k
    least-bad views keeps the objective defined everywhere; final
    ACCEPTANCE still requires a strict selection at the converged depth
    (local_view_selection.cc success semantics)."""
    masked = jnp.where(nvalid[:, None, None], ncc, -1e30)
    vals, idx = jax.lax.top_k(jnp.moveaxis(masked, 0, -1), k)  # (H, W, k)
    sel = jnp.moveaxis(idx, -1, 0).astype(jnp.int32)
    valid = jnp.moveaxis(vals, -1, 0) > -1e29
    return sel, valid


def _reselect_with_fallback(ncc, nvalid, depth, ray_world, cam_rel, k,
                            min_ncc, min_parallax):
    """Strict per-pixel view selection, falling back to the k best raw
    NCC views where the strict selection found fewer than k."""
    sel, sel_valid = _local_view_selection(
        ncc, nvalid, depth, ray_world, cam_rel, k, min_ncc, min_parallax)
    loose_sel, loose_valid = _topk_views(ncc, nvalid, k)
    strict_ok = sel_valid.all(axis=0)
    sel = jnp.where(strict_ok[None], sel, loose_sel)
    sel_valid = jnp.where(strict_ok[None], sel_valid, loose_valid)
    return sel, sel_valid


def _local_view_selection(ncc, nvalid, depth, ray_world, cam_rel, k,
                          min_ncc, min_parallax):
    """Greedy per-pixel selection of k diverse views.

    ncc: (J, H, W); cam_rel: (J, 3) neighbor centers minus the reference
    center. Returns (sel (k, H, W) int32, valid (k, H, W) bool)."""
    p_rel = ray_world * depth[..., None]                  # p - ref_pos
    ref_dir = ray_world
    vd = p_rel[None] - cam_rel[:, None, None, :]          # (J, H, W, 3)
    vd = vd / jnp.maximum(jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-12)
    ep = jnp.cross(vd, ref_dir[None])
    ep = ep / jnp.maximum(jnp.linalg.norm(ep, axis=-1, keepdims=True), 1e-12)

    w = ncc * _parallax_weight(jnp.sum(vd * ref_dir[None], -1))
    w = jnp.where(ncc < min_ncc, 0.0, w)
    w = jnp.where(nvalid[:, None, None], w, 0.0)
    sels, valids = [], []
    J = ncc.shape[0]
    for _ in range(k):
        idx = jnp.argmax(w, axis=0)
        best = jnp.take_along_axis(w, idx[None], axis=0)[0]
        sels.append(idx.astype(jnp.int32))
        valids.append(best > 0.0)
        d_sel = jnp.take_along_axis(vd, idx[None, ..., None], axis=0)[0]
        e_sel = jnp.take_along_axis(ep, idx[None, ..., None], axis=0)[0]
        w = jnp.where(jnp.arange(J)[:, None, None] == idx[None], 0.0, w)
        w = w * _parallax_weight(jnp.sum(vd * d_sel[None], -1))
        dp = jnp.abs(jnp.sum(ep * e_sel[None], -1))
        ang = jnp.degrees(jnp.arccos(jnp.clip(dp, -1.0, 1.0)))
        ang = jnp.maximum(ang, 1.0)
        w = w * jnp.where(ang < min_parallax, ang / min_parallax, 1.0)
    return jnp.stack(sels), jnp.stack(valids)


# -----------------------------------------------------------------------
# plane normals (patch_sampler.cc getPatchNormal) on device
# -----------------------------------------------------------------------

def _plane_normals(depth, dzx, dzy, ray_world, r):
    H, W = depth.shape
    rays = jnp.pad(ray_world, ((r, r), (r, r), (0, 0)), mode="edge")

    def p(dx, dy):
        L = depth + dx * dzx + dy * dzy
        return L[..., None] * jax.lax.dynamic_slice(
            rays, (r + dy, r + dx, 0), (H, W, 3))

    a = p(r, 0) - p(-r, 0)
    b = p(0, -r) - p(0, r)
    n = jnp.cross(a, b)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.maximum(norm, 1e-30)


# -----------------------------------------------------------------------
# the fused per-view program
# -----------------------------------------------------------------------

def _chunked_best(score_fn, cands, best, chunk):
    """Fold a candidate stack into the incumbent, `chunk` at a time.

    cands: (K, H, W); best: (d, s, kth). lax.scan keeps peak memory at
    one chunk's score tensors regardless of K."""
    K, H, W = cands.shape
    pad = (-K) % chunk
    if pad:
        cands = jnp.concatenate(
            [cands, jnp.full((pad, H, W), -1.0, cands.dtype)])
    chunks = cands.reshape(-1, chunk, H, W)

    def body(best, ch):
        bd, bs, bk = best
        cs, ck = score_fn(ch)
        all_d = jnp.concatenate([bd[None], ch])
        all_s = jnp.concatenate([bs[None], cs])
        all_k = jnp.concatenate([bk[None], ck])
        pick = jnp.argmax(all_s, axis=0)[None]
        take = lambda a: jnp.take_along_axis(a, pick, axis=0)[0]
        return (take(all_d), take(all_s), take(all_k)), None

    best, _ = jax.lax.scan(body, best, chunks)
    return best


def _solve_view(ref, neigh, nvalid, T, tvec, ray_z, init_depth, dmin, dmax,
                abs_planes, ray_world, cam_rel, scalars, *,
                fw, k, n_prop, n_refine, n_plane_rounds, use_local, exact,
                rel_factors, chunk):
    """One reference view end-to-end on device. All inputs are arrays of
    static shape; `scalars` = [min_ncc, min_parallax, accept_ncc,
    min_refine_diff]."""
    H, W = ref.shape
    J = neigh.shape[0]
    min_ncc, min_parallax, accept_ncc, min_refine_diff = (
        scalars[0], scalars[1], scalars[2], scalars[3])
    rstats = _ref_box_stats(ref, fw)
    zeros = jnp.zeros_like(init_depth)

    if exact:
        # Per-tap warps (the plane kernel at zero slope) — the faithful
        # formulation of the reference's fronto-parallel patches.
        def score_all(ds):
            z0 = jnp.zeros_like(ds)
            return _ncc_plane_all(ref, neigh, nvalid, T, tvec, ray_z,
                                  ds, z0, z0, fw, k)
    else:
        def score_all(ds):
            ncc, ok = _ncc_box_all(ref, rstats, neigh, nvalid, T, tvec,
                                   ray_z, ds, fw)
            return _combine_topk(ncc, ok, k)

    def score_sel(ds, sel, sel_valid):
        if exact:
            z0 = jnp.zeros_like(ds)
            return _ncc_plane_sel(ref, neigh, T, tvec, ray_z, ds, z0, z0,
                                  sel, sel_valid, fw)
        ncc, ok = _ncc_box_sel(ref, rstats, neigh, T, tvec, ray_z, ds,
                               sel, sel_valid, fw)
        return _combine_sel(ncc, ok)

    # --- plane sweep: relative fan around the init + absolute planes.
    s0, k0 = score_all(init_depth[None])
    best = (init_depth, s0[0], k0[0])
    rel_stack = jnp.stack([init_depth * f for f in rel_factors])
    abs_stack = jnp.broadcast_to(abs_planes[:, None, None],
                                 (abs_planes.shape[0], H, W))
    best = _chunked_best(score_all, jnp.concatenate([rel_stack, abs_stack]),
                         best, chunk)

    # --- local view selection state
    if use_local:
        def reselect(d):
            ncc, _ = _ncc_box_all(ref, rstats, neigh, nvalid, T, tvec,
                                  ray_z, d[None], fw)
            return _reselect_with_fallback(
                ncc[:, 0], nvalid, d, ray_world, cam_rel, k,
                min_ncc, min_parallax)

        sel, sel_valid = reselect(best[0])
        s1, k1 = score_sel(best[0][None], sel, sel_valid)
        best = (best[0], s1[0], k1[0])

        def score_fn(ds, sel, sel_valid):
            return score_sel(ds, sel, sel_valid)
    else:
        sel = jnp.zeros((k, H, W), jnp.int32)
        sel_valid = jnp.zeros((k, H, W), bool)

        def score_fn(ds, sel, sel_valid):
            return score_all(ds)

    # --- PatchMatch propagation rounds (lax.scan over rounds)
    shifts = ((0, 1), (0, -1), (1, 0), (-1, 0), (0, 3), (3, 0), (0, -3), (-3, 0))
    eps_prop = jnp.asarray([0.05 * (0.5 ** it) for it in range(max(n_prop, 1))],
                           jnp.float32)
    half = n_prop // 2

    def prop_body(carry, xs):
        it, eps = xs
        bd, bs, bk, sel, sel_valid = carry
        if use_local:
            def refresh(args):
                bd, bs, bk, sel, sel_valid = args
                sel2, sv2 = reselect(bd)
                s2, k2 = score_sel(bd[None], sel2, sv2)
                return bd, s2[0], k2[0], sel2, sv2

            bd, bs, bk, sel, sel_valid = jax.lax.cond(
                it == half, refresh, lambda a: a, (bd, bs, bk, sel, sel_valid))
        cands = jnp.stack(
            [jnp.roll(bd, (dy, dx), axis=(0, 1)) for dy, dx in shifts]
            + [bd * (1.0 - eps), bd * (1.0 + eps)])
        bd, bs, bk = _chunked_best(
            lambda ds: score_fn(ds, sel, sel_valid), cands, (bd, bs, bk), chunk)
        return (bd, bs, bk, sel, sel_valid), None

    if n_prop > 0:
        carry = (best[0], best[1], best[2], sel, sel_valid)
        carry, _ = jax.lax.scan(
            prop_body, carry,
            (jnp.arange(n_prop), eps_prop[:n_prop]))
        best = carry[:3]
        sel, sel_valid = carry[3], carry[4]

    # --- parabolic refinement (replaces Gauss-Newton depth steps)
    eps_ref = jnp.asarray([0.02 * (0.5 ** s) for s in range(max(n_refine, 1))],
                          jnp.float32)

    def refine_body(best, eps):
        bd, bs, bk = best
        d_lo = bd * (1.0 - eps)
        d_hi = bd * (1.0 + eps)
        both, _ = score_fn(jnp.stack([d_lo, d_hi]), sel, sel_valid)
        s_lo, s_hi = both[0], both[1]
        denom = s_lo - 2.0 * bs + s_hi
        offset = jnp.where(
            jnp.abs(denom) > 1e-12,
            jnp.clip(0.5 * (s_lo - s_hi)
                     / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom),
                     -1.0, 1.0),
            0.0)
        cand = bd * (1.0 + offset * eps)
        best = _chunked_best(lambda ds: score_fn(ds, sel, sel_valid),
                             jnp.stack([cand, d_lo, d_hi]), best, chunk)
        return best, None

    if n_refine > 0:
        best, _ = jax.lax.scan(refine_body, best, eps_ref[:n_refine])

    # --- joint depth+normal (slanted plane) rounds
    bd, bs, bk = best

    def plane_score(ds, zxs, zys):
        if use_local:
            return _ncc_plane_sel(ref, neigh, T, tvec, ray_z, ds, zxs, zys,
                                  sel, sel_valid, fw)
        return _ncc_plane_all(ref, neigh, nvalid, T, tvec, ray_z,
                              ds, zxs, zys, fw, k)

    if n_plane_rounds > 0:
        # Slopes from the current surface, capped at ~80 deg obliquity —
        # steeper planes are degenerate and their chaotic warps destroy
        # gather locality (see round-2 notes in dmrecon.py history).
        slope_cap = 0.05 * jnp.maximum(bd, 1e-6)
        init_zx = jnp.clip((jnp.roll(bd, -1, 1) - jnp.roll(bd, 1, 1)) * 0.5,
                           -slope_cap, slope_cap)
        init_zy = jnp.clip((jnp.roll(bd, -1, 0) - jnp.roll(bd, 1, 0)) * 0.5,
                           -slope_cap, slope_cap)
        s_pl, k_pl = plane_score(bd[None], zeros[None], zeros[None])
        si, ki = plane_score(bd[None], init_zx[None], init_zy[None])
        better = si[0] > s_pl[0]
        state = (bd,
                 jnp.where(better, init_zx, zeros),
                 jnp.where(better, init_zy, zeros),
                 jnp.where(better, si[0], s_pl[0]),
                 jnp.where(better, ki[0], k_pl[0]))

        def plane_best_of(state, cands):
            sd, szx, szy, ss, sk = state
            ds = jnp.stack([c[0] for c in cands])
            zxs = jnp.stack([c[1] for c in cands])
            zys = jnp.stack([c[2] for c in cands])
            cs, ck = plane_score(ds, zxs, zys)
            all_s = jnp.concatenate([ss[None], cs])
            all_k = jnp.concatenate([sk[None], ck])
            all_d = jnp.concatenate([sd[None], ds])
            all_zx = jnp.concatenate([szx[None], zxs])
            all_zy = jnp.concatenate([szy[None], zys])
            pick = jnp.argmax(all_s, axis=0)[None]
            take = lambda a: jnp.take_along_axis(a, pick, axis=0)[0]
            return (take(all_d), take(all_zx), take(all_zy),
                    take(all_s), take(all_k))

        eps_pl = jnp.asarray([0.3 * (0.5 ** r) for r in range(n_plane_rounds)],
                             jnp.float32)

        def plane_body(carry, eps):
            state, prev_mean, done = carry
            sd, szx, szy, ss, sk = state
            cap = 0.05 * jnp.maximum(sd, 1e-6)
            step = eps * jnp.maximum(sd, 1e-6) * 0.02
            clampz = lambda z: jnp.clip(z, -cap, cap)
            cands = []
            for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                nd = jnp.roll(sd, (dy, dx), axis=(0, 1))
                nzx = jnp.roll(szx, (dy, dx), axis=(0, 1))
                nzy = jnp.roll(szy, (dy, dx), axis=(0, 1))
                cands.append((nd + dx * nzx + dy * nzy, nzx, nzy))
            cands += [
                (sd, clampz(szx + step), szy), (sd, clampz(szx - step), szy),
                (sd, szx, clampz(szy + step)), (sd, szx, clampz(szy - step)),
                (sd - step, szx, szy), (sd + step, szx, szy),
            ]
            new_state = plane_best_of(state, cands)
            mean_s = jnp.mean(jnp.maximum(new_state[3], 0.0))
            # Convergence freeze (the reference's deltaNCC < min_refine_diff
            # rule, patch_optimization.cc:218): once improvement stalls,
            # later rounds keep the converged state.
            state = jax.tree.map(
                lambda old, new: jnp.where(done, old, new), state, new_state)
            prev_ok = prev_mean > -1e30
            done = done | (prev_ok & (mean_s - prev_mean < min_refine_diff))
            return (state, jnp.where(done, prev_mean, mean_s), done), None

        carry = (state, jnp.asarray(-1e31, jnp.float32),
                 jnp.asarray(False))
        carry, _ = jax.lax.scan(plane_body, carry, eps_pl)
        bd, bzx, bzy, bs, bk = carry[0]
    else:
        bzx, bzy = zeros, zeros

    bd = jnp.clip(bd, dmin * 0.5, dmax * 2.0)

    # --- final STRICT view selection at the converged depth: the
    # optimization above may have scored through the loose top-k
    # fallback (_reselect_with_fallback); acceptance keeps the
    # reference's semantics — a pixel needs a successful local view
    # selection of k quality views (local_view_selection.cc success).
    if use_local:
        ncc_f, _ = _ncc_box_all(ref, rstats, neigh, nvalid, T, tvec,
                                ray_z, bd[None], fw)
        sel, sel_valid = _local_view_selection(
            ncc_f[:, 0], nvalid, bd, ray_world, cam_rel, k,
            min_ncc, min_parallax)
        s_f, k_f = plane_score(bd[None], bzx[None], bzy[None])
        bs, bk = s_f[0], k_f[0]

    # --- confidence + acceptance (patch_optimization.cc:120-142): gate
    # on the MEAN selected NCC like the reference (per-view dips cause
    # view replacement there, not rejection).
    conf = jnp.maximum((bs - accept_ncc) / (1.0 - accept_ncc), 0.0)
    normal = _plane_normals(bd, bzx, bzy, ray_world, fw // 2)
    dotp = -jnp.sum(normal * ray_world, axis=-1)
    conf = jnp.where(dotp >= 0.2, conf, 0.0)
    accepted = conf > 0.0
    depth_out = jnp.where(accepted, bd, 0.0).astype(jnp.float32)
    dz_out = jnp.where(accepted[..., None],
                       jnp.stack([bzx, bzy], axis=-1), 0.0).astype(jnp.float32)
    return depth_out, conf.astype(jnp.float32), dz_out, jnp.sum(accepted)


@functools.partial(
    jax.jit,
    static_argnames=("fw", "k", "n_prop", "n_refine", "n_plane_rounds",
                     "use_local", "exact", "rel_factors", "chunk"))
def solve_batch(ref, neigh, nvalid, T, tvec, ray_z, init_depth, dmin, dmax,
                abs_planes, ray_world, cam_rel, scalars, *,
                fw: int, k: int, n_prop: int, n_refine: int,
                n_plane_rounds: int, use_local: bool, exact: bool,
                rel_factors: tuple, chunk: int = 8):
    """Reconstruct a batch of reference views in one device program.

    ref: (B, H, W); neigh: (B, J, Hn, Wn) padded; nvalid: (B, J);
    T: (B, J, 3, 3); tvec: (B, J, 3); ray_z/init_depth: (B, H, W);
    dmin/dmax: (B,); abs_planes: (B, n_abs); ray_world: (B, H, W, 3);
    cam_rel: (B, J, 3); scalars: (4,) [min_ncc, min_parallax, accept_ncc,
    min_refine_diff].
    Returns (depth (B, H, W), conf (B, H, W), dz (B, H, W, 2),
    n_accepted (B,)).
    """
    fn = functools.partial(
        _solve_view, fw=fw, k=k, n_prop=n_prop, n_refine=n_refine,
        n_plane_rounds=n_plane_rounds, use_local=use_local, exact=exact,
        rel_factors=rel_factors, chunk=chunk)
    return jax.vmap(fn, in_axes=(0,) * 12 + (None,))(
        ref, neigh, nvalid, T, tvec, ray_z, init_depth, dmin, dmax,
        abs_planes, ray_world, cam_rel, scalars)
