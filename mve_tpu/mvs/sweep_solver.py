"""Rectified plane-sweep MVS solver — the TPU-native formulation.

The reference (libs/dmrecon/patch_sampler.cc getFastNCC) and the warp
solver (mvs/solver.py) both evaluate NCC by gathering bilinear taps at
per-pixel warped positions. On TPU, XLA lowers arbitrary gathers to
~65M loads/s (measured on v5e over this repo's shapes) — three orders
of magnitude below VPU/MXU throughput — so every candidate evaluation
pays the worst path the hardware has.

This solver removes data-dependent gathers from the optimization loop
entirely:

1. **Rectify** each (reference, neighbor) pair once: rotate both
   cameras onto the baseline (Fusiello-style closed form) so epipolar
   lines become horizontal scanlines. Two bilinear warps per pair,
   total J x 2 gathers — once, not per candidate.
2. **Sweep** D inverse-rectified-depth planes. In rectified space a
   fronto-parallel plane is a CONSTANT horizontal disparity
   delta = f*|baseline|*w, so each plane evaluation is a fractional
   shift (two dynamic slices + lerp) and box-filtered NCC statistics —
   pure VPU work. Result: an NCC cube (D, H, W) per neighbor.
3. **Re-index** the cube to reference pixels: the rectified coordinates
   of a reference pixel are fixed per pair, so the cube maps back with
   4 corner row-gathers of D-vectors (embedding-style lookup, fast) →
   per-pixel NCC-vs-plane tables, stored bf16.
4. **Optimize** exactly like the warp solver (plane sweep init, local
   view selection, PatchMatch propagation, parabolic refinement,
   slanted-plane rounds, confidence) — but every score is now a 2-tap
   interpolation along the table's D axis, computed as one-hot bf16
   matmuls on the MXU (measured ~500x the gather formulation).
5. **Exact rescore** of the converged depth with one true-warp NCC pass
   (the only remaining gather, K=1) so confidences keep the reference's
   patch semantics (patch_optimization.cc computeConfidence).

Depth candidates remain REFERENCE RAY LENGTHS L (MVE convention,
depthmap.h:55-64); the per-pair table index is w' = 1/(L * c_j(p)) with
c_j(p) = e3_j . ray_dir(p) the per-pixel rectified-z cosine.

Slanted-plane rounds keep the (depth, dzx, dzy) parametrization for
candidate GENERATION (propagated plane extrapolation, normals) but
score through the per-pixel depth field (box approximation); the final
exact pass keeps acceptance faithful.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .patch import _box_sum
from .solver import (_combine_sel, _combine_topk, _local_view_selection,
                     _ncc_box_all, _plane_normals, _ref_box_stats,
                     _reselect_with_fallback)


# -----------------------------------------------------------------------
# host-side rectification geometry
# -----------------------------------------------------------------------

def rect_margins(H: int, W: int):
    """Legacy fixed rect-grid margin (superseded by the fitted per-pair
    grids of rectify_pair with image_wh; kept for API compatibility)."""
    return H // 8, W // 8


_RECT_PAD = 4  # rect-grid padding per side (NCC window + bilinear taps)


def rectify_pair(K_r, R_r, t_r, K_j, R_j, t_j, min_cross: float = 0.08,
                 margin_yx=(0, 0), image_wh=None):
    """Closed-form rectifying rotation for one (ref, neighbor) pair.

    Returns dict(M_ref, M_nei, H_fwd, e3, fB, rect_wh) or None when the
    baseline is too close to the reference viewing direction (epipole in
    view — rectification degenerates; caller falls back to the warp
    solver).

    M_ref: rect pixel -> ref pixel homography (for warping ref->rect)
    M_nei: rect pixel -> neighbor pixel homography
    H_fwd: ref pixel -> rect pixel homography (fixed table coords)
    e3:    new z axis in world coords (rect depth z' = L * (e3.dir))
    fB:    f_x * |baseline| — disparity per unit inverse rect depth
    rect_wh: (w, h) grid size containing the WHOLE ref image under
        H_fwd. Pixels falling off the rect grid lose this pair entirely
        and, under the all-k-views acceptance gate, their depth — so
        when image_wh=(w, h) is given the grid is FITTED: the rect
        camera's principal point is chosen so the mapped ref-image bbox
        starts at (_RECT_PAD, _RECT_PAD). Legacy callers pass margin_yx
        for a fixed shift instead (rect_wh is then None).
    """
    K_r = np.asarray(K_r, np.float64)
    K_j = np.asarray(K_j, np.float64)
    R_r = np.asarray(R_r, np.float64)
    R_j = np.asarray(R_j, np.float64)
    C_r = -R_r.T @ np.asarray(t_r, np.float64)
    C_j = -R_j.T @ np.asarray(t_j, np.float64)
    b = C_j - C_r
    nb = np.linalg.norm(b)
    if nb < 1e-12:
        return None
    e1 = b / nb
    rz = R_r[2]  # ref viewing direction in world
    a = np.cross(rz, e1)
    na = np.linalg.norm(a)
    if na < min_cross:
        return None  # baseline ~ viewing direction: epipole in image
    e2 = a / na
    e3 = np.cross(e1, e2)
    Rn = np.stack([e1, e2, e3])  # world -> rect rotation
    Kn = K_r.copy()
    rect_wh = None
    if image_wh is not None:
        # Fit: map the ref image corners with the UNSHIFTED rect camera,
        # then place the principal point so the bbox sits at the pad.
        w, h = image_wh
        Hf0 = Kn @ Rn @ R_r.T @ np.linalg.inv(K_r)
        c = np.array([[0.5, 0.5, 1.0], [w - 0.5, 0.5, 1.0],
                      [0.5, h - 0.5, 1.0], [w - 0.5, h - 0.5, 1.0]]).T
        m = Hf0 @ c
        if (m[2] <= 1e-9).any():
            return None  # a ref corner maps behind the rect camera
        uv = (m[:2] / m[2]).T
        lo = np.floor(uv.min(axis=0)) - _RECT_PAD
        hi = np.ceil(uv.max(axis=0)) + _RECT_PAD
        Kn[0, 2] -= lo[0]
        Kn[1, 2] -= lo[1]
        rect_wh = (int(hi[0] - lo[0] + 1), int(hi[1] - lo[1] + 1))
    else:
        Kn[1, 2] += margin_yx[0]  # principal point shift = grid margin
        Kn[0, 2] += margin_yx[1]
    M_ref = K_r @ R_r @ Rn.T @ np.linalg.inv(Kn)
    M_nei = K_j @ R_j @ Rn.T @ np.linalg.inv(Kn)
    H_fwd = Kn @ Rn @ R_r.T @ np.linalg.inv(K_r)
    fB = float(Kn[0, 0]) * nb
    return dict(M_ref=M_ref.astype(np.float32),
                M_nei=M_nei.astype(np.float32),
                H_fwd=H_fwd.astype(np.float32),
                e3=e3.astype(np.float32), fB=fB, rect_wh=rect_wh)


# -----------------------------------------------------------------------
# device primitives
# -----------------------------------------------------------------------

def _homography_warp(img, M, H, W, fill=-1e3):
    """Sample `img` at homography-mapped rect grid positions.

    img: (Hi, Wi); M: (3, 3) maps rect pixel-centers -> img pixel
    coords. Returns ((H, W) samples, (H, W) validity)."""
    Hi, Wi = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    qx = xs + 0.5
    qy = ys + 0.5
    hx = M[0, 0] * qx + M[0, 1] * qy + M[0, 2]
    hy = M[1, 0] * qx + M[1, 1] * qy + M[1, 2]
    hz = M[2, 0] * qx + M[2, 1] * qy + M[2, 2]
    hz = jnp.where(jnp.abs(hz) < 1e-20, 1e-20, hz)
    u = hx / hz - 0.5
    v = hy / hz - 0.5
    inb = (u >= 0) & (u <= Wi - 1) & (v >= 0) & (v <= Hi - 1)
    u0 = jnp.clip(jnp.floor(u), 0, Wi - 2)
    v0 = jnp.clip(jnp.floor(v), 0, Hi - 2)
    fu = (u - u0).astype(img.dtype)
    fv = (v - v0).astype(img.dtype)
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    p00 = img[v0i, u0i]
    p01 = img[v0i, u0i + 1]
    p10 = img[v0i + 1, u0i]
    p11 = img[v0i + 1, u0i + 1]
    out = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
           + p10 * (1 - fu) * fv + p11 * fu * fv)
    return jnp.where(inb, out, fill), inb


def _frac_shift_x(img, shift):
    """img(y, x - shift) for scalar shift >= 0 via two dynamic slices.

    Rectified disparity moves neighbor content LEFT relative to the
    reference (x_nei = x_ref - f|b|w'), so the reference-grid sample of
    the neighbor is at x - shift."""
    H, W = img.shape
    pad = jnp.full((H, W + 1), -1e3, img.dtype)
    padded = jnp.concatenate([pad, img], axis=1)  # (H, 2W+1)
    s = jnp.clip(shift, 0.0, W)
    s0 = jnp.floor(s).astype(jnp.int32)
    f = (s - jnp.floor(s)).astype(img.dtype)
    a = jax.lax.dynamic_slice(padded, (0, W + 1 - s0), (H, W))       # x - s0
    b = jax.lax.dynamic_slice(padded, (0, W - s0), (H, W))           # x - s0 - 1
    out = a * (1 - f) + b * f
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    valid = xs - shift >= 0
    return out, valid


def _build_cube(rref, rref_ok, rnei, rnei_ok, fB, w0, dw, D: int, fw: int):
    """NCC cube over D constant-disparity planes for ONE pair.

    rref/rnei: (H, W) rectified images; returns (D, H, W) NCC (bf16)."""
    n_taps = fw * fw
    ok_r = rref_ok
    refv = jnp.where(ok_r, rref, 0.0)
    sum_r = _box_sum(refv, fw)
    sum_rr = _box_sum(refv * refv, fw)
    mean_r = sum_r / n_taps
    var_r = sum_rr / n_taps - mean_r * mean_r

    def plane(k):
        delta = fB * (w0 + k.astype(jnp.float32) * dw)
        nv, sv = _frac_shift_x(rnei, delta)
        ok = ok_r & rnei_ok & sv & (nv > -1e2)
        nv = jnp.where(ok, nv, 0.0)
        cnt = _box_sum(ok.astype(jnp.float32), fw)
        full = cnt >= n_taps - 0.5
        sum_n = _box_sum(nv, fw)
        sum_nn = _box_sum(nv * nv, fw)
        sum_rn = _box_sum(nv * refv, fw)
        mean_n = sum_n / n_taps
        var_n = sum_nn / n_taps - mean_n * mean_n
        cov = sum_rn / n_taps - mean_r * mean_n
        denom = jnp.sqrt(jnp.maximum(var_r * var_n, 1e-12))
        ncc = jnp.where(full, cov / denom, -1.0)
        return ncc.astype(jnp.bfloat16)

    return jax.vmap(plane)(jnp.arange(D))


def _reindex_cube(cube, H_fwd, H, W):
    """Sample the rect-space cube at each REF pixel's fixed rect coords.

    cube: (D, Hr, Wr) bf16 -> table (H, W, D) bf16 via 4 corner
    row-gathers (embedding-style: contiguous D-vectors per row)."""
    D, Hr, Wr = cube.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    qx = xs + 0.5
    qy = ys + 0.5
    hx = H_fwd[0, 0] * qx + H_fwd[0, 1] * qy + H_fwd[0, 2]
    hy = H_fwd[1, 0] * qx + H_fwd[1, 1] * qy + H_fwd[1, 2]
    hz = H_fwd[2, 0] * qx + H_fwd[2, 1] * qy + H_fwd[2, 2]
    hz = jnp.where(jnp.abs(hz) < 1e-20, 1e-20, hz)
    u = hx / hz - 0.5
    v = hy / hz - 0.5
    inb = (u >= 0) & (u <= Wr - 1) & (v >= 0) & (v <= Hr - 1)
    u0 = jnp.clip(jnp.floor(u), 0, Wr - 2)
    v0 = jnp.clip(jnp.floor(v), 0, Hr - 2)
    fu = (u - u0).astype(jnp.bfloat16)[..., None]
    fv = (v - v0).astype(jnp.bfloat16)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    rows = cube.transpose(1, 2, 0).reshape(Hr * Wr, D)  # (Hr*Wr, D)

    def take(vv, uu):
        return jnp.take(rows, vv * Wr + uu, axis=0)

    t = (take(v0i, u0i) * (1 - fu) * (1 - fv)
         + take(v0i, u0i + 1) * fu * (1 - fv)
         + take(v0i + 1, u0i) * (1 - fu) * fv
         + take(v0i + 1, u0i + 1) * fu * fv)
    return jnp.where(inb[..., None], t, jnp.bfloat16(-1.0))


def _lookup(tab, c_j, w0, dw, nvalid, L):
    """Score candidate ray lengths against the per-pixel plane tables.

    tab: (J, H, W, D) bf16; c_j: (J, H, W); w0/dw: (J,); L: (K, H, W).
    Returns (ncc (J, K, H, W) f32, ok (J, K, H, W) bool).

    The 2-tap interpolation along D runs as two one-hot bf16
    contractions on the MXU (exact 0/1 weights; lerp in f32 outside) —
    the fast path that replaces data-dependent gathers."""
    D = tab.shape[-1]
    Ls = jnp.maximum(L, 1e-12)[None]                         # (1, K, H, W)
    w = 1.0 / (Ls * jnp.maximum(c_j[:, None], 1e-6))         # (J, K, H, W)
    idx = (w - w0[:, None, None, None]) / dw[:, None, None, None]
    ok = (idx >= 0) & (idx <= D - 1) & (c_j[:, None] > 1e-6)
    ok = ok & nvalid[:, None, None, None] & (L > 0)[None]
    idx = jnp.clip(idx, 0.0, D - 1.0001)
    i0 = jnp.floor(idx).astype(jnp.int32)
    f = (idx - jnp.floor(idx)).astype(jnp.float32)
    oh0 = jax.nn.one_hot(i0, D, dtype=jnp.bfloat16, axis=-1)
    oh1 = jax.nn.one_hot(i0 + 1, D, dtype=jnp.bfloat16, axis=-1)
    v0 = jnp.einsum("jkhwd,jhwd->jkhw", oh0, tab,
                    preferred_element_type=jnp.float32)
    v1 = jnp.einsum("jkhwd,jhwd->jkhw", oh1, tab,
                    preferred_element_type=jnp.float32)
    ncc = v0 * (1.0 - f) + v1 * f
    # Either tap outside the cube's valid content reads -1 fills; treat
    # strongly negative as invalid.
    ok = ok & (v0 > -0.999) & (v1 > -0.999)
    return jnp.where(ok, ncc, -1.0), ok


# -----------------------------------------------------------------------
# the fused per-view program (sweep-table formulation)
# -----------------------------------------------------------------------

def _chunked_best_sw(score_fn, cands, best, chunk):
    """mvs.solver._chunked_best for the lookup scorer (same contract)."""
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


def _solve_view_sweep(ref, neigh, nvalid, T, tvec, ray_z,
                      M_ref, M_nei, H_fwd, e3, fB, w0, dw,
                      init_depth, dmin, dmax, ray_world, cam_rel, scalars, *,
                      fw, k, D, n_prop, n_refine, n_plane_rounds, use_local,
                      chunk, rect_hw=None):
    """One reference view end-to-end with table-lookup scoring."""
    H, W = ref.shape
    J = neigh.shape[0]
    min_ncc, min_parallax, accept_ncc, min_refine_diff = (
        scalars[0], scalars[1], scalars[2], scalars[3])
    zeros = jnp.zeros_like(init_depth)

    # --- per-pair tables (rectify -> sweep -> reindex)
    c_j = jnp.einsum("jc,hwc->jhw", e3, ray_world)       # rect z cosine
    if rect_hw is None:  # legacy fixed margins
        my, mx = rect_margins(H, W)
        Hr, Wr = H + 2 * my, W + 2 * mx
    else:
        Hr, Wr = rect_hw

    def build_pair(args):
        nei, Mr, Mn, Hf, fb, w0j, dwj = args
        rref, rok = _homography_warp(ref, Mr, Hr, Wr)
        rnei, nok = _homography_warp(nei, Mn, Hr, Wr)
        cube = _build_cube(rref, rok, rnei, nok, fb, w0j, dwj, D, fw)
        return _reindex_cube(cube, Hf, H, W)

    tab = jax.lax.map(build_pair, (neigh, M_ref, M_nei, H_fwd, fB, w0, dw))

    def score_all(L):
        ncc, ok = _lookup(tab, c_j, w0, dw, nvalid, L)
        return _combine_topk(ncc, ok, k)

    def score_sel_fn(L, sel, sel_valid):
        # Select per-pixel views via a one-hot contraction over J (J is
        # tiny; an einsum beats the scalarized gather path by far).
        ncc, ok = _lookup(tab, c_j, w0, dw, nvalid, L)
        oh = jax.nn.one_hot(sel, J, dtype=jnp.float32, axis=-1)  # (S,H,W,J)
        ncc_s = jnp.einsum("shwj,jkhw->skhw", oh, ncc,
                           preferred_element_type=jnp.float32)
        ok_s = jnp.einsum("shwj,jkhw->skhw", oh, ok.astype(jnp.float32),
                          preferred_element_type=jnp.float32) > 0.5
        ok_s = ok_s & sel_valid[:, None]
        return _combine_sel(jnp.where(ok_s, ncc_s, -1.0), ok_s)

    # --- plane sweep init: D_sweep ray-length planes + the seed field
    s0, k0 = score_all(init_depth[None])
    best = (init_depth, s0[0], k0[0])
    n_sweep = D
    lds = jnp.exp(jnp.linspace(jnp.log(jnp.maximum(dmin, 1e-6)),
                               jnp.log(jnp.maximum(dmax, 2e-6)), n_sweep))
    abs_stack = jnp.broadcast_to(lds[:, None, None], (n_sweep, H, W))
    rel_stack = jnp.stack([init_depth * f for f in
                           (0.85, 0.93, 1.0 / 0.93, 1.0 / 0.85)])
    best = _chunked_best_sw(score_all,
                            jnp.concatenate([rel_stack, abs_stack]),
                            best, chunk)

    # --- local view selection
    if use_local:
        def reselect(d):
            ncc, _ = _lookup(tab, c_j, w0, dw, nvalid, d[None])
            sel, sel_valid = _local_view_selection(
                ncc[:, 0], nvalid, d, ray_world, cam_rel, k,
                min_ncc, min_parallax)
            return sel, sel_valid

        sel, sel_valid = reselect(best[0])
        s1, k1 = score_sel_fn(best[0][None], sel, sel_valid)
        best = (best[0], s1[0], k1[0])

        def score_fn(L, sel, sel_valid):
            return score_sel_fn(L, sel, sel_valid)
    else:
        sel = jnp.zeros((k, H, W), jnp.int32)
        sel_valid = jnp.zeros((k, H, W), bool)

        def score_fn(L, sel, sel_valid):
            return score_all(L)

    # --- PatchMatch propagation rounds
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
                s2, k2 = score_sel_fn(bd[None], sel2, sv2)
                return bd, s2[0], k2[0], sel2, sv2

            bd, bs, bk, sel, sel_valid = jax.lax.cond(
                it == half, refresh, lambda a: a, (bd, bs, bk, sel, sel_valid))
        cands = jnp.stack(
            [jnp.roll(bd, (dy, dx), axis=(0, 1)) for dy, dx in shifts]
            + [bd * (1.0 - eps), bd * (1.0 + eps)])
        bd, bs, bk = _chunked_best_sw(
            lambda L: score_fn(L, sel, sel_valid), cands, (bd, bs, bk), chunk)
        return (bd, bs, bk, sel, sel_valid), None

    if n_prop > 0:
        carry = (best[0], best[1], best[2], sel, sel_valid)
        carry, _ = jax.lax.scan(
            prop_body, carry, (jnp.arange(n_prop), eps_prop[:n_prop]))
        best = carry[:3]
        sel, sel_valid = carry[3], carry[4]

    # --- parabolic refinement
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
        best = _chunked_best_sw(lambda L: score_fn(L, sel, sel_valid),
                                jnp.stack([cand, d_lo, d_hi]), best, chunk)
        return best, None

    if n_refine > 0:
        best, _ = jax.lax.scan(refine_body, best, eps_ref[:n_refine])

    # --- slanted-plane rounds: plane parametrization for propagation,
    # lookup scoring through the per-pixel depth field.
    bd, bs, bk = best
    if n_plane_rounds > 0:
        slope_cap = 0.05 * jnp.maximum(bd, 1e-6)
        bzx = jnp.clip((jnp.roll(bd, -1, 1) - jnp.roll(bd, 1, 1)) * 0.5,
                       -slope_cap, slope_cap)
        bzy = jnp.clip((jnp.roll(bd, -1, 0) - jnp.roll(bd, 1, 0)) * 0.5,
                       -slope_cap, slope_cap)

        eps_pl = jnp.asarray([0.3 * (0.5 ** r) for r in range(n_plane_rounds)],
                             jnp.float32)

        def plane_body(carry, eps):
            state, prev_mean, done = carry
            sd, szx, szy, ss, sk = state
            cap = 0.05 * jnp.maximum(sd, 1e-6)
            step = eps * jnp.maximum(sd, 1e-6) * 0.02
            clampz = lambda z: jnp.clip(z, -cap, cap)
            cands, czx, czy = [], [], []
            for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                nd = jnp.roll(sd, (dy, dx), axis=(0, 1))
                nzx = jnp.roll(szx, (dy, dx), axis=(0, 1))
                nzy = jnp.roll(szy, (dy, dx), axis=(0, 1))
                cands.append(nd + dx * nzx + dy * nzy)
                czx.append(nzx)
                czy.append(nzy)
            for dd, zx, zy in ((0.0, step, None), (0.0, -step, None),
                               (0.0, None, step), (0.0, None, -step),
                               (-1.0, None, None), (1.0, None, None)):
                cands.append(sd + dd * step)
                czx.append(clampz(szx + zx) if zx is not None else szx)
                czy.append(clampz(szy + zy) if zy is not None else szy)
            ds = jnp.stack(cands)
            zxs = jnp.stack(czx)
            zys = jnp.stack(czy)
            cs, ck = score_fn(ds, sel, sel_valid)
            all_s = jnp.concatenate([ss[None], cs])
            all_k = jnp.concatenate([sk[None], ck])
            all_d = jnp.concatenate([sd[None], ds])
            all_zx = jnp.concatenate([szx[None], zxs])
            all_zy = jnp.concatenate([szy[None], zys])
            pick = jnp.argmax(all_s, axis=0)[None]
            take = lambda a: jnp.take_along_axis(a, pick, axis=0)[0]
            new_state = (take(all_d), take(all_zx), take(all_zy),
                         take(all_s), take(all_k))
            mean_s = jnp.mean(jnp.maximum(new_state[3], 0.0))
            state = jax.tree.map(
                lambda old, new: jnp.where(done, old, new), state, new_state)
            prev_ok = prev_mean > -1e30
            done = done | (prev_ok & (mean_s - prev_mean < min_refine_diff))
            return (state, jnp.where(done, prev_mean, mean_s), done), None

        carry = ((bd, bzx, bzy, bs, bk), jnp.asarray(-1e31, jnp.float32),
                 jnp.asarray(False))
        carry, _ = jax.lax.scan(plane_body, carry, eps_pl)
        bd, bzx, bzy, bs, bk = carry[0]
    else:
        bzx, bzy = zeros, zeros

    bd = jnp.clip(bd, dmin * 0.5, dmax * 2.0)

    # --- exact true-warp polish + rescore (the only gathers left).
    # Table scores are piecewise-linear between the D planes, so the
    # lookup refinement snaps toward plane nodes; two parabolic steps on
    # the TRUE box NCC restore sub-plane depth accuracy, and the final
    # evaluation keeps the reference's patch semantics for acceptance
    # (patch_optimization.cc computeConfidence).
    rstats = _ref_box_stats(ref, fw)

    def score_exact(L):
        ncc_x, ok_x = _ncc_box_all(ref, rstats, neigh, nvalid, T, tvec,
                                   ray_z, L, fw)
        if use_local:
            K = L.shape[0]
            oh = jax.nn.one_hot(sel, J, dtype=jnp.float32, axis=-1)
            ncc_s = jnp.einsum("shwj,jkhw->skhw", oh, ncc_x,
                               preferred_element_type=jnp.float32)
            ok_s = jnp.einsum("shwj,jkhw->skhw", oh,
                              ok_x.astype(jnp.float32),
                              preferred_element_type=jnp.float32) > 0.5
            ok_s = ok_s & sel_valid[:, None]
            return _combine_sel(jnp.where(ok_s, ncc_s, -1.0), ok_s)
        return _combine_topk(ncc_x, ok_x, k)

    # Reselect views from EXACT NCC first (loose fallback): pixels whose
    # rect tables were partially invalid (off-grid taps, shift margins)
    # but whose TRUE warps are fine — borders, mostly — regain their
    # views here and can participate in the exact rounds below.
    if use_local:
        ncc_x0, _ = _ncc_box_all(ref, rstats, neigh, nvalid, T, tvec,
                                 ray_z, bd[None], fw)
        sel, sel_valid = _reselect_with_fallback(
            ncc_x0[:, 0], nvalid, bd, ray_world, cam_rel, k,
            min_ncc, min_parallax)

    # Exact PatchMatch rounds: true-warp region growing into pixels the
    # table phase could not score (occlusion bands, image borders) —
    # the batched analog of the reference's exact sequential growing
    # (dmrecon.cc:334-434 processQueue).
    s_now, k_now = score_exact(bd[None])
    bs, bk = s_now[0], k_now[0]
    for rnd in range(3):
        if use_local and rnd:
            # Refresh the loose selection at the improved depth: stale
            # selections block depths just propagated from neighbors.
            ncc_xr, _ = _ncc_box_all(ref, rstats, neigh, nvalid, T, tvec,
                                     ray_z, bd[None], fw)
            sel, sel_valid = _reselect_with_fallback(
                ncc_xr[:, 0], nvalid, bd, ray_world, cam_rel, k,
                min_ncc, min_parallax)
            s_now, k_now = score_exact(bd[None])
            bs, bk = s_now[0], k_now[0]
        cands = jnp.stack(
            [jnp.roll(bd, (dy, dx), axis=(0, 1))
             for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                            (0, 3), (0, -3), (3, 0), (-3, 0))])
        cs, ck = score_exact(cands)
        all_d = jnp.concatenate([bd[None], cands])
        all_s = jnp.concatenate([bs[None], cs])
        all_k = jnp.concatenate([bk[None], ck])
        pick = jnp.argmax(all_s, axis=0)[None]
        take = lambda a: jnp.take_along_axis(a, pick, axis=0)[0]
        bd, bs, bk = take(all_d), take(all_s), take(all_k)

    # Final STRICT selection at the converged depth for acceptance
    # (local_view_selection.cc success semantics).
    if use_local:
        ncc_xf, _ = _ncc_box_all(ref, rstats, neigh, nvalid, T, tvec,
                                 ray_z, bd[None], fw)
        sel, sel_valid = _local_view_selection(
            ncc_xf[:, 0], nvalid, bd, ray_world, cam_rel, k,
            min_ncc, min_parallax)
    s_now, k_now = score_exact(bd[None])
    bs, bk = s_now[0], k_now[0]
    # Three parabolic polish rounds: the lookup phase's piecewise-linear
    # scores snap depths to inverse-depth plane nodes (up to ~4-5%
    # relative at the far end of a D=64 table), so the exact polish must
    # be able to move that far.
    for eps in (0.025, 0.01, 0.004):
        d_lo = bd * (1.0 - eps)
        d_hi = bd * (1.0 + eps)
        both, both_k = score_exact(jnp.stack([d_lo, d_hi]))
        s_lo, s_hi = both[0], both[1]
        denom = s_lo - 2.0 * bs + s_hi
        offset = jnp.where(
            denom < -1e-12,
            jnp.clip(0.5 * (s_lo - s_hi)
                     / jnp.where(jnp.abs(denom) < 1e-12, -1e-12, denom),
                     -1.0, 1.0),
            0.0)
        cand = bd * (1.0 + offset * eps)
        cs, ck = score_exact(cand[None])
        stack_d = jnp.stack([bd, cand, d_lo, d_hi])
        stack_s = jnp.stack([bs, cs[0], s_lo, s_hi])
        stack_k = jnp.stack([bk, ck[0], both_k[0], both_k[1]])
        pick = jnp.argmax(stack_s, axis=0)[None]
        take = lambda a: jnp.take_along_axis(a, pick, axis=0)[0]
        bd, bs, bk = take(stack_d), take(stack_s), take(stack_k)

    # Output plane slopes from the converged surface: lookup scoring is
    # slope-free (box approximation), so the propagated (zx, zy) state
    # only steers candidate generation; the output estimate is the 3x3
    # box-averaged gradient of the polished depth field (what the
    # reference's optimized dzI/dzJ converge to on smooth surfaces).
    cap = 0.05 * jnp.maximum(bd, 1e-6)
    gx = (jnp.roll(bd, -1, 1) - jnp.roll(bd, 1, 1)) * 0.5
    gy = (jnp.roll(bd, -1, 0) - jnp.roll(bd, 1, 0)) * 0.5
    bzx = jnp.clip(_box_sum(gx, 3) / 9.0, -cap, cap)
    bzy = jnp.clip(_box_sum(gy, 3) / 9.0, -cap, cap)

    # Final CENTER-PLANE acceptance pass: the box NCC used through the
    # solve warps every window tap at that tap's OWN depth-field value,
    # so at depth boundaries (where window neighbors hold the other
    # surface, or no estimate) taps go invalid and the score collapses —
    # a 1-2px rejection band around every filled region (~3 fill points
    # vs the reference on the r04 bench). The reference scores the
    # CENTER pixel's patch plane across the whole window
    # (patch_sampler.cc computePatchPoints + getFastNCC), which stays
    # well-defined right up to the boundary. Re-run per-view NCC with
    # the converged center plane, re-select views on THOSE scores
    # (selection from box scores would re-introduce the collapse), and
    # accept on the better of the two scores.
    if use_local:
        from .patch import _plane_tap_sums

        Jn = neigh.shape[0]
        jidx_all = jnp.arange(Jn)[:, None, None, None]

        def gather_all(v0i, u0i):
            return neigh[jidx_all, v0i, u0i]

        def select_and_mean(ncc_p, dd):
            """performVS-on-propagated-pixels selection + acceptance
            mean: any positive-NCC diverse view qualifies (min_ncc gates
            only FRESH candidates in the reference,
            local_view_selection.cc:30-44,78)."""
            sel_f, ok_f = _local_view_selection(
                ncc_p, nvalid, dd, ray_world, cam_rel, k, 0.0,
                min_parallax)
            sel_ncc = jnp.take_along_axis(ncc_p, sel_f, axis=0)
            psk, _ = _combine_sel(sel_ncc, ok_f)
            return psk

        # Box-scored region growing into the band the strict phase could
        # not accept: extrapolate each 4-neighbor's converged plane to
        # this pixel (the reference's processQueue pushes neighbors with
        # the optimized patch as the seed) and keep whichever field
        # scores best under propagation-style view selection. Box NCC on
        # the EXTRAPOLATED field is coherent around the boundary (the
        # window reads the donor plane), unlike on the raw field.
        shifts = ((0, 1), (0, -1), (1, 0), (-1, 0))
        for _ in range(2):
            cd = jnp.stack([
                jnp.roll(bd, (dy, dx), (0, 1))
                + jnp.roll(bzx, (dy, dx), (0, 1)) * dx
                + jnp.roll(bzy, (dy, dx), (0, 1)) * dy
                for dy, dx in shifts])
            czx = jnp.stack([jnp.roll(bzx, (dy, dx), (0, 1))
                             for dy, dx in shifts])
            czy = jnp.stack([jnp.roll(bzy, (dy, dx), (0, 1))
                             for dy, dx in shifts])
            ncc_g, ok_g = _ncc_box_all(ref, rstats, neigh, nvalid, T,
                                       tvec, ray_z, cd, fw)
            ncc_g = jnp.where(ok_g & nvalid[:, None, None, None],
                              ncc_g, -1.0)
            cs = jnp.stack([select_and_mean(ncc_g[:, ki], cd[ki])
                            for ki in range(len(shifts))])
            alld = jnp.concatenate([bd[None], cd])
            allzx = jnp.concatenate([bzx[None], czx])
            allzy = jnp.concatenate([bzy[None], czy])
            alls = jnp.concatenate([bs[None], cs])
            pick = jnp.argmax(alls, axis=0)[None]
            take = lambda a: jnp.take_along_axis(a, pick, axis=0)[0]
            bd, bzx, bzy, bs = (take(alld), take(allzx), take(allzy),
                                take(alls))

        # ONE final CENTER-PLANE acceptance pass at the converged plane
        # (the reference's patch acceptance semantics,
        # patch_sampler.cc getFastNCC): the whole window warps with the
        # center pixel's plane, which stays well-defined right at depth
        # boundaries where per-tap field warps collapse.
        ncc_pl, valid_pl = _plane_tap_sums(
            ref, neigh, T[:, None, None, None], tvec[:, None, None, None],
            gather_all, ray_z, bd[None], bzx[None], bzy[None], fw, (Jn,))
        ncc_pl = jnp.where(valid_pl & nvalid[:, None, None, None],
                           ncc_pl, -1.0)[:, 0]
        bs = jnp.maximum(bs, select_and_mean(ncc_pl, bd))

    # --- confidence + acceptance (patch_optimization.cc:120-142): the
    # reference's score is (MEAN selected NCC - acceptNCC)/(1 - accept)
    # — per-view NCC dips trigger view replacement during optimization
    # (handled here by the mid-run reselect), not pixel rejection.
    conf = jnp.maximum((bs - accept_ncc) / (1.0 - accept_ncc), 0.0)
    normal = _plane_normals(bd, bzx, bzy, ray_world, fw // 2)
    dotp = -jnp.sum(normal * ray_world, axis=-1)
    conf = jnp.where(dotp >= 0.2, conf, 0.0)
    # Master-patch in-bounds requirement (patch_sampler.cc
    # computeMasterSamples): the reference never reconstructs pixels
    # whose 5x5 window leaves the reference image; our box sums zero-pad
    # there, making border scores meaningless — garbage depths were the
    # accepted-pixel RMSE tail.
    Hh, Ww = bd.shape
    r_b = fw // 2
    yy = jnp.arange(Hh)[:, None]
    xx = jnp.arange(Ww)[None, :]
    in_master = ((yy >= r_b) & (yy < Hh - r_b)
                 & (xx >= r_b) & (xx < Ww - r_b))
    conf = jnp.where(in_master, conf, 0.0)
    accepted = conf > 0.0
    depth_out = jnp.where(accepted, bd, 0.0).astype(jnp.float32)
    dz_out = jnp.where(accepted[..., None],
                       jnp.stack([bzx, bzy], axis=-1), 0.0).astype(jnp.float32)
    return depth_out, conf.astype(jnp.float32), dz_out, jnp.sum(accepted)


@functools.partial(
    jax.jit,
    static_argnames=("fw", "k", "D", "n_prop", "n_refine", "n_plane_rounds",
                     "use_local", "chunk", "rect_hw"))
def solve_batch_sweep(ref, neigh, nvalid, T, tvec, ray_z,
                      M_ref, M_nei, H_fwd, e3, fB, w0, dw,
                      init_depth, dmin, dmax, ray_world, cam_rel, scalars, *,
                      fw: int, k: int, D: int, n_prop: int, n_refine: int,
                      n_plane_rounds: int, use_local: bool, chunk: int = 8,
                      rect_hw=None):
    """Batched rectified-sweep reconstruction (one device program).

    Shapes as solver.solve_batch plus per-pair rectification data:
    M_ref/M_nei/H_fwd: (B, J, 3, 3); e3: (B, J, 3); fB/w0/dw: (B, J).
    rect_hw: static (Hr, Wr) rect-grid size fitted on the host to cover
    every pair's mapped ref image (rectify_pair rect_wh).
    """
    fn = functools.partial(
        _solve_view_sweep, fw=fw, k=k, D=D, n_prop=n_prop,
        n_refine=n_refine, n_plane_rounds=n_plane_rounds,
        use_local=use_local, chunk=chunk, rect_hw=rect_hw)
    return jax.vmap(fn, in_axes=(0,) * 18 + (None,))(
        ref, neigh, nvalid, T, tvec, ray_z, M_ref, M_nei, H_fwd, e3, fB,
        w0, dw, init_depth, dmin, dmax, ray_world, cam_rel, scalars)
