"""Batched NCC patch scoring (reference: libs/dmrecon/patch_sampler.cc
getFastNCC / fastColAndDeriv).

For every reference pixel simultaneously: sample a filter_width^2 patch
in each neighbor view through the reprojection operator
xd = T xs z + t (camera.h:105-125) at the pixel's candidate depth, and
compute normalized cross-correlation against the reference patch. The
reference's per-pixel scalar loops become one (H, W, J) tensor program:
the patch loop is unrolled (25 taps), each tap is a bilinear gather.

Depth convention: candidate depths are RAY LENGTHS (MVE convention,
depthmap.h:55-64); conversion to z-depth uses the per-pixel unit-ray z
component, precomputed once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def make_patch_offsets(filter_width: int):
    r = filter_width // 2
    offs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            offs.append((dy, dx))
    return tuple(offs)


def _box_sum(x, w: int):
    """Separable w x w box sum with edge padding; x: (..., H, W)."""
    r = w // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)]
    x = jnp.pad(x, pad, mode="edge")
    x = jnp.cumsum(x, axis=-2)
    upper = x[..., w - 1 :, :]
    lower = jnp.pad(x[..., : -w, :], [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)])
    x = upper - lower
    pad = [(0, 0)] * (x.ndim - 2) + [(0, 0), (r, r)]
    x = jnp.pad(x, pad, mode="edge")
    x = jnp.cumsum(x, axis=-1)
    upper = x[..., :, w - 1 :]
    lower = jnp.pad(x[..., :, : -w], [(0, 0)] * (x.ndim - 2) + [(0, 0), (1, 0)])
    return upper - lower


@functools.partial(jax.jit, static_argnames=("filter_width", "top_k"))
def ncc_score_box(ref_img, neigh_imgs, T, tvec, ray_z, depths,
                  filter_width: int = 5, top_k: int = 4):
    """Box-filter NCC over candidate depth stacks — the fast formulation.

    Warps each pixel ONCE per (neighbor, candidate) with its own depth
    and computes windowed statistics with separable box sums (dense VPU
    work) instead of 25 gathers per pixel. Exact when depth is locally
    constant over the patch; at depth edges it mixes neighboring pixels'
    depths where the exact kernel (ncc_score) uses the center's
    fronto-parallel plane. 25x less gather traffic.

    depths: (K, H, W). Returns (score (K, H, W), kth (K, H, W)).
    """
    K = depths.shape[0]
    H, W = ref_img.shape
    J, Hn, Wn = neigh_imgs.shape
    fw = filter_width
    n_taps = fw * fw

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    z = depths * ray_z[None]  # (K, H, W)
    qx = xs + 0.5
    qy = ys + 0.5

    # Warp all pixels for all (J, K): h = T (qx qy 1) z + t.
    hx = (T[:, 0, 0, None, None, None] * qx + T[:, 0, 1, None, None, None] * qy
          + T[:, 0, 2, None, None, None]) * z[None] + tvec[:, 0, None, None, None]
    hy = (T[:, 1, 0, None, None, None] * qx + T[:, 1, 1, None, None, None] * qy
          + T[:, 1, 2, None, None, None]) * z[None] + tvec[:, 1, None, None, None]
    hz = (T[:, 2, 0, None, None, None] * qx + T[:, 2, 1, None, None, None] * qy
          + T[:, 2, 2, None, None, None]) * z[None] + tvec[:, 2, None, None, None]
    hz_safe = jnp.where(jnp.abs(hz) < 1e-20, 1e-20, hz)
    u = hx / hz_safe - 0.5  # (J, K, H, W)
    v = hy / hz_safe - 0.5
    inb = (u >= 0) & (u <= Wn - 1) & (v >= 0) & (v <= Hn - 1) & (hz > 0)

    u0 = jnp.clip(jnp.floor(u), 0, Wn - 2)
    v0 = jnp.clip(jnp.floor(v), 0, Hn - 2)
    fu = jnp.clip(u - u0, 0.0, 1.0)
    fv = jnp.clip(v - v0, 0.0, 1.0)
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    jidx = jnp.arange(J)[:, None, None, None]
    p00 = neigh_imgs[jidx, v0i, u0i]
    p01 = neigh_imgs[jidx, v0i, u0i + 1]
    p10 = neigh_imgs[jidx, v0i + 1, u0i]
    p11 = neigh_imgs[jidx, v0i + 1, u0i + 1]
    nv = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
          + p10 * (1 - fu) * fv + p11 * fu * fv)
    nv = jnp.where(inb, nv, 0.0)

    # Reference statistics once.
    sum_r = _box_sum(ref_img, fw)
    sum_rr = _box_sum(ref_img * ref_img, fw)
    mean_r = sum_r / n_taps
    var_r = sum_rr / n_taps - mean_r * mean_r

    # Neighbor statistics per (J, K).
    cnt = _box_sum(inb.astype(jnp.float32), fw)
    full = cnt >= n_taps - 0.5
    sum_n = _box_sum(nv, fw)
    sum_nn = _box_sum(nv * nv, fw)
    sum_rn = _box_sum(nv * ref_img[None, None], fw)
    mean_n = sum_n / n_taps
    var_n = sum_nn / n_taps - mean_n * mean_n
    cov = sum_rn / n_taps - mean_r[None, None] * mean_n
    denom = jnp.sqrt(jnp.maximum(var_r[None, None] * var_n, 1e-12))
    ncc = jnp.where(full, cov / denom, -1.0)  # (J, K, H, W)

    k = min(top_k, J)
    top = jax.lax.top_k(jnp.moveaxis(ncc, 0, -1), k)[0]  # (K, H, W, k)
    n_valid = jnp.sum(full, axis=0)  # (K, H, W)
    score = jnp.mean(top, axis=-1)
    kth = top[..., -1]
    score = jnp.where(n_valid >= k, score, -1.0)
    kth = jnp.where(n_valid >= k, kth, -1.0)
    return score, kth


@functools.partial(jax.jit, static_argnames=("filter_width", "top_k"))
def ncc_score_multi(ref_img, neigh_imgs, T, tvec, ray_z, depths,
                    filter_width: int = 5, top_k: int = 4):
    """Score a stack of candidate depth maps in one dispatch.

    depths: (K, H, W) -> (scores (K, H, W), kth-best NCC (K, H, W)).
    One device call per propagation round instead of one per candidate.
    """
    return jax.vmap(
        lambda d: ncc_score(ref_img, neigh_imgs, T, tvec, ray_z, d,
                            filter_width=filter_width, top_k=top_k)
    )(depths)


@functools.partial(jax.jit, static_argnames=("filter_width", "top_k"))
def ncc_score(ref_img, neigh_imgs, T, tvec, ray_z, depth,
              filter_width: int = 5, top_k: int = 4):
    """Combined NCC score for a candidate ray-length depth map.

    ref_img: (H, W) float32 grayscale reference at the working level.
    neigh_imgs: (J, Hn, Wn) neighbor grayscales (same level).
    T: (J, 3, 3), tvec: (J, 3) — reprojection operators ref -> neighbor.
    ray_z: (H, W) z-component of the unit viewing ray per ref pixel.
    depth: (H, W) candidate ray-length depths.

    Returns (score (H, W), mean NCC over the top_k neighbors).
    """
    H, W = ref_img.shape
    J = neigh_imgs.shape[0]
    Hn, Wn = neigh_imgs.shape[1], neigh_imgs.shape[2]
    offsets = make_patch_offsets(filter_width)
    n_taps = len(offsets)

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    z = depth * ray_z  # ray length -> z-depth

    # Running sums for NCC (per neighbor).
    sum_r = jnp.zeros((H, W))
    sum_rr = jnp.zeros((H, W))
    sum_n = jnp.zeros((J, H, W))
    sum_nn = jnp.zeros((J, H, W))
    sum_rn = jnp.zeros((J, H, W))
    valid = jnp.ones((J, H, W), bool)

    ref_pad = jnp.pad(ref_img, filter_width // 2, mode="edge")
    r = filter_width // 2

    for (dy, dx) in offsets:
        # Reference tap (edge-padded shift).
        rv = jax.lax.dynamic_slice(ref_pad, (r + dy, r + dx), (H, W))
        sum_r = sum_r + rv
        sum_rr = sum_rr + rv * rv
        # Warp tap position through each neighbor. The reprojection
        # operator works in K coordinates where pixel centers sit at
        # integer + 0.5 (camera.h:80-86), hence the +-0.5 shifts.
        qx = xs + dx + 0.5
        qy = ys + dy + 0.5
        # h = T @ (qx, qy, 1) * z + t   -> (J, H, W, 3)
        hx = (T[:, 0, 0, None, None] * qx + T[:, 0, 1, None, None] * qy
              + T[:, 0, 2, None, None]) * z + tvec[:, 0, None, None]
        hy = (T[:, 1, 0, None, None] * qx + T[:, 1, 1, None, None] * qy
              + T[:, 1, 2, None, None]) * z + tvec[:, 1, None, None]
        hz = (T[:, 2, 0, None, None] * qx + T[:, 2, 1, None, None] * qy
              + T[:, 2, 2, None, None]) * z + tvec[:, 2, None, None]
        hz_safe = jnp.where(jnp.abs(hz) < 1e-20, 1e-20, hz)
        u = hx / hz_safe - 0.5
        v = hy / hz_safe - 0.5
        inb = (u >= 0) & (u <= Wn - 1) & (v >= 0) & (v <= Hn - 1) & (hz > 0)
        valid = valid & inb
        # Bilinear gather from each neighbor.
        u0 = jnp.clip(jnp.floor(u), 0, Wn - 2)
        v0 = jnp.clip(jnp.floor(v), 0, Hn - 2)
        fu = jnp.clip(u - u0, 0.0, 1.0)
        fv = jnp.clip(v - v0, 0.0, 1.0)
        u0i = u0.astype(jnp.int32)
        v0i = v0.astype(jnp.int32)
        jidx = jnp.arange(J)[:, None, None]
        p00 = neigh_imgs[jidx, v0i, u0i]
        p01 = neigh_imgs[jidx, v0i, u0i + 1]
        p10 = neigh_imgs[jidx, v0i + 1, u0i]
        p11 = neigh_imgs[jidx, v0i + 1, u0i + 1]
        nv = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
              + p10 * (1 - fu) * fv + p11 * fu * fv)
        sum_n = sum_n + nv
        sum_nn = sum_nn + nv * nv
        sum_rn = sum_rn + rv[None] * nv

    inv_n = 1.0 / n_taps
    mean_r = sum_r * inv_n
    mean_n = sum_n * inv_n
    var_r = sum_rr * inv_n - mean_r * mean_r
    var_n = sum_nn * inv_n - mean_n * mean_n
    cov = sum_rn * inv_n - mean_r[None] * mean_n
    denom = jnp.sqrt(jnp.maximum(var_r[None] * var_n, 1e-12))
    ncc = cov / denom  # (J, H, W)
    ncc = jnp.where(valid, ncc, -1.0)

    # Mean over the top_k best neighbors per pixel (the batched analog of
    # local view selection's "best 4 of the global set"). The k-th best
    # NCC rides in as a penalty so acceptance can require EVERY selected
    # neighbor to reach acceptNCC (patch_optimization.cc:216 replaces
    # views below acceptNCC; a pixel whose k-th view stays below fails).
    k = min(top_k, J)
    top = jax.lax.top_k(jnp.moveaxis(ncc, 0, -1), k)[0]  # (H, W, k)
    n_valid = jnp.sum(valid, axis=0)  # (H, W)
    score = jnp.mean(top, axis=-1)
    kth = top[..., -1]
    score = jnp.where(n_valid >= k, score, -1.0)
    kth = jnp.where(n_valid >= k, kth, -1.0)
    return score, kth


def _plane_tap_sums(ref_img, neigh_imgs, Tg, tg, gather, ray_z,
                    depths, dzx, dzy, filter_width: int, lead_shape):
    """Shared tap loop for slanted-patch (plane) NCC.

    The patch plane is the reference's (depth, dzI, dzJ) parametrization
    (patch_sampler.cc computePatchPoints): the ray length at patch tap
    (di, dj) is depth + di*dzI + dj*dzJ, the 3D point lies on that tap's
    own viewing ray. Each tap warps into the neighbor views with its own
    plane-induced z-depth — the plane-induced homography sampled at the
    taps.

    Tg/tg: broadcastable reprojection operators with leading dims
    lead_shape (e.g. (S, 1) for selected views x candidates or (J, 1)).
    gather(v0i, u0i): bilinear corner gather returning neighbor values.
    depths/dzx/dzy: (K, H, W) candidate plane stacks.
    Returns per-(lead..., K, H, W) NCC plus validity.
    """
    K, H, W = depths.shape
    fw = filter_width
    r = fw // 2
    n_taps = fw * fw
    Hn, Wn = neigh_imgs.shape[-2], neigh_imgs.shape[-1]

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ref_pad = jnp.pad(ref_img, r, mode="edge")
    rayz_pad = jnp.pad(ray_z, r, mode="edge")

    shape = tuple(lead_shape) + (K, H, W)
    sum_r = jnp.zeros((H, W))
    sum_rr = jnp.zeros((H, W))
    sum_n = jnp.zeros(shape)
    sum_nn = jnp.zeros(shape)
    sum_rn = jnp.zeros(shape)
    valid = jnp.ones(shape, bool)

    for (dy, dx) in make_patch_offsets(fw):
        rv = jax.lax.dynamic_slice(ref_pad, (r + dy, r + dx), (H, W))
        rz = jax.lax.dynamic_slice(rayz_pad, (r + dy, r + dx), (H, W))
        sum_r = sum_r + rv
        sum_rr = sum_rr + rv * rv
        L = depths + dx * dzx + dy * dzy      # (K, H, W) tap ray length
        pos_ok = L > 0.0                      # patch_sampler.cc:285-288
        z = L * rz
        qx = xs + dx + 0.5
        qy = ys + dy + 0.5
        hx = (Tg[..., 0, 0] * qx + Tg[..., 0, 1] * qy + Tg[..., 0, 2]) * z + tg[..., 0]
        hy = (Tg[..., 1, 0] * qx + Tg[..., 1, 1] * qy + Tg[..., 1, 2]) * z + tg[..., 1]
        hz = (Tg[..., 2, 0] * qx + Tg[..., 2, 1] * qy + Tg[..., 2, 2]) * z + tg[..., 2]
        hz_safe = jnp.where(jnp.abs(hz) < 1e-20, 1e-20, hz)
        u = hx / hz_safe - 0.5
        v = hy / hz_safe - 0.5
        inb = (u >= 0) & (u <= Wn - 1) & (v >= 0) & (v <= Hn - 1) & (hz > 0)
        valid = valid & inb & pos_ok
        u0 = jnp.clip(jnp.floor(u), 0, Wn - 2)
        v0 = jnp.clip(jnp.floor(v), 0, Hn - 2)
        fu = jnp.clip(u - u0, 0.0, 1.0)
        fv = jnp.clip(v - v0, 0.0, 1.0)
        u0i = u0.astype(jnp.int32)
        v0i = v0.astype(jnp.int32)
        p00 = gather(v0i, u0i)
        p01 = gather(v0i, u0i + 1)
        p10 = gather(v0i + 1, u0i)
        p11 = gather(v0i + 1, u0i + 1)
        nv = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
              + p10 * (1 - fu) * fv + p11 * fu * fv)
        sum_n = sum_n + nv
        sum_nn = sum_nn + nv * nv
        sum_rn = sum_rn + rv * nv

    inv_n = 1.0 / n_taps
    mean_r = sum_r * inv_n
    mean_n = sum_n * inv_n
    var_r = sum_rr * inv_n - mean_r * mean_r
    var_n = sum_nn * inv_n - mean_n * mean_n
    cov = sum_rn * inv_n - mean_r * mean_n
    denom = jnp.sqrt(jnp.maximum(var_r * var_n, 1e-12))
    ncc = jnp.where(valid, cov / denom, -1.0)
    return ncc, valid


@functools.partial(jax.jit, static_argnames=("filter_width", "top_k"))
def ncc_score_plane(ref_img, neigh_imgs, T, tvec, ray_z, depths, dzx, dzy,
                    filter_width: int = 5, top_k: int = 4):
    """Slanted-patch NCC over ALL views, top-k combined.

    depths/dzx/dzy: (K, H, W) plane candidates (ray length + per-pixel
    ray-length gradients, the reference's depth/dzI/dzJ). Returns
    (score (K, H, W), kth (K, H, W))."""
    J = neigh_imgs.shape[0]
    jidx = jnp.arange(J)[:, None, None, None]

    def gather(v0i, u0i):
        return neigh_imgs[jidx, v0i, u0i]

    ncc, valid = _plane_tap_sums(
        ref_img, neigh_imgs, T[:, None, None, None],
        tvec[:, None, None, None], gather, ray_z, depths, dzx, dzy,
        filter_width, (J,))
    k = min(top_k, J)
    top = jax.lax.top_k(jnp.moveaxis(ncc, 0, -1), k)[0]
    n_valid = jnp.sum(valid, axis=0)
    score = jnp.mean(top, axis=-1)
    kth = top[..., -1]
    score = jnp.where(n_valid >= k, score, -1.0)
    kth = jnp.where(n_valid >= k, kth, -1.0)
    return score, kth


@functools.partial(jax.jit, static_argnames=("filter_width",))
def ncc_score_plane_sel(ref_img, neigh_imgs, T, tvec, ray_z, depths,
                        dzx, dzy, sel, sel_valid, filter_width: int = 5):
    """Slanted-patch NCC over per-pixel SELECTED views.

    sel: (S, H, W) int32; sel_valid: (S, H, W); depths/dzx/dzy: (K, H, W).
    Returns (score (K, H, W), kth (K, H, W)) like ncc_score_box_sel."""
    S = sel.shape[0]
    Tg = T[sel]        # (S, H, W, 3, 3)
    tg = tvec[sel]     # (S, H, W, 3)
    jidx = sel[:, None]

    def gather(v0i, u0i):
        return neigh_imgs[jidx, v0i, u0i]

    ncc, valid = _plane_tap_sums(
        ref_img, neigh_imgs, Tg[:, None], tg[:, None], gather, ray_z,
        depths, dzx, dzy, filter_width, (S,))
    ok = valid & sel_valid[:, None]
    ncc = jnp.where(ok, ncc, -1.0)
    n_ok = jnp.sum(ok, axis=0)
    score = jnp.sum(jnp.where(ok, ncc, 0.0), axis=0) / jnp.maximum(n_ok, 1)
    kth = jnp.min(jnp.where(ok, ncc, 1.0), axis=0)
    score = jnp.where(n_ok >= S, score, -1.0)
    kth = jnp.where(n_ok >= S, kth, -1.0)
    return score, kth


def _warp_bilinear(neigh_imgs, T, tvec, z, qx, qy):
    """Warp reference pixels into neighbor views and gather bilinearly.

    T: (..., 3, 3), tvec: (..., 3) broadcastable against z's leading axes;
    z, qx, qy broadcast to the output shape. Returns (values, in_bounds).
    """
    J, Hn, Wn = neigh_imgs.shape if neigh_imgs.ndim == 3 else (
        None, neigh_imgs.shape[-2], neigh_imgs.shape[-1])
    hx = (T[..., 0, 0] * qx + T[..., 0, 1] * qy + T[..., 0, 2]) * z + tvec[..., 0]
    hy = (T[..., 1, 0] * qx + T[..., 1, 1] * qy + T[..., 1, 2]) * z + tvec[..., 1]
    hz = (T[..., 2, 0] * qx + T[..., 2, 1] * qy + T[..., 2, 2]) * z + tvec[..., 2]
    hz_safe = jnp.where(jnp.abs(hz) < 1e-20, 1e-20, hz)
    u = hx / hz_safe - 0.5
    v = hy / hz_safe - 0.5
    inb = (u >= 0) & (u <= Wn - 1) & (v >= 0) & (v <= Hn - 1) & (hz > 0)
    u0 = jnp.clip(jnp.floor(u), 0, Wn - 2)
    v0 = jnp.clip(jnp.floor(v), 0, Hn - 2)
    fu = jnp.clip(u - u0, 0.0, 1.0)
    fv = jnp.clip(v - v0, 0.0, 1.0)
    return u0.astype(jnp.int32), v0.astype(jnp.int32), fu, fv, inb


@functools.partial(jax.jit, static_argnames=("filter_width",))
def ncc_per_view_box(ref_img, neigh_imgs, T, tvec, ray_z, depth,
                     filter_width: int = 5):
    """Box-filter NCC of EVERY neighbor at one depth map: (J, H, W).

    Feeds local view selection (the reference's sampler->getFastNCC per
    candidate view, local_view_selection.cc:77)."""
    H, W = ref_img.shape
    J, Hn, Wn = neigh_imgs.shape
    fw = filter_width
    n_taps = fw * fw
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    z = depth * ray_z
    u0i, v0i, fu, fv, inb = _warp_bilinear(
        neigh_imgs, T[:, None, None], tvec[:, None, None],
        z[None], xs + 0.5, ys + 0.5)
    jidx = jnp.arange(J)[:, None, None]
    p00 = neigh_imgs[jidx, v0i, u0i]
    p01 = neigh_imgs[jidx, v0i, u0i + 1]
    p10 = neigh_imgs[jidx, v0i + 1, u0i]
    p11 = neigh_imgs[jidx, v0i + 1, u0i + 1]
    nv = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
          + p10 * (1 - fu) * fv + p11 * fu * fv)
    nv = jnp.where(inb, nv, 0.0)

    sum_r = _box_sum(ref_img, fw)
    sum_rr = _box_sum(ref_img * ref_img, fw)
    mean_r = sum_r / n_taps
    var_r = sum_rr / n_taps - mean_r * mean_r
    cnt = _box_sum(inb.astype(jnp.float32), fw)
    full = cnt >= n_taps - 0.5
    sum_n = _box_sum(nv, fw)
    sum_nn = _box_sum(nv * nv, fw)
    sum_rn = _box_sum(nv * ref_img[None], fw)
    mean_n = sum_n / n_taps
    var_n = sum_nn / n_taps - mean_n * mean_n
    cov = sum_rn / n_taps - mean_r[None] * mean_n
    denom = jnp.sqrt(jnp.maximum(var_r[None] * var_n, 1e-12))
    return jnp.where(full, cov / denom, -1.0)


@functools.partial(jax.jit, static_argnames=("filter_width",))
def ncc_score_box_sel(ref_img, neigh_imgs, T, tvec, ray_z, depths,
                      sel, sel_valid, filter_width: int = 5):
    """Box-filter NCC over per-pixel SELECTED views only.

    sel: (S, H, W) int32 neighbor indices from local_view_selection;
    sel_valid: (S, H, W) bool. depths: (K, H, W) candidate ray lengths.
    Returns (score (K, H, W) = mean NCC over valid selected views,
    kth (K, H, W) = worst selected NCC). Scoring S=4 selected views costs
    S/J of the all-views kernel — local view selection doubles as the
    inner loop's work reducer (the reference optimizes only against its
    4 selected views too, patch_optimization.cc).

    Approximation note: the box window around a pixel aggregates warped
    values of *each window pixel's own* i-th selected view; exact when the
    selection is locally constant, which holds away from selection
    boundaries (same regime as ncc_score_box's locally-constant depth).
    """
    K = depths.shape[0]
    H, W = ref_img.shape
    S = sel.shape[0]
    fw = filter_width
    n_taps = fw * fw
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    z = depths * ray_z[None]                           # (K, H, W)

    Tg = T[sel]                                        # (S, H, W, 3, 3)
    tg = tvec[sel]                                     # (S, H, W, 3)
    u0i, v0i, fu, fv, inb = _warp_bilinear(
        neigh_imgs, Tg[:, None], tg[:, None], z[None],
        xs + 0.5, ys + 0.5)                            # all (S, K, H, W)
    jidx = sel[:, None]                                # (S, 1, H, W)
    p00 = neigh_imgs[jidx, v0i, u0i]
    p01 = neigh_imgs[jidx, v0i, u0i + 1]
    p10 = neigh_imgs[jidx, v0i + 1, u0i]
    p11 = neigh_imgs[jidx, v0i + 1, u0i + 1]
    nv = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
          + p10 * (1 - fu) * fv + p11 * fu * fv)
    nv = jnp.where(inb, nv, 0.0)

    sum_r = _box_sum(ref_img, fw)
    sum_rr = _box_sum(ref_img * ref_img, fw)
    mean_r = sum_r / n_taps
    var_r = sum_rr / n_taps - mean_r * mean_r
    cnt = _box_sum(inb.astype(jnp.float32), fw)
    full = cnt >= n_taps - 0.5
    sum_n = _box_sum(nv, fw)
    sum_nn = _box_sum(nv * nv, fw)
    sum_rn = _box_sum(nv * ref_img[None, None], fw)
    mean_n = sum_n / n_taps
    var_n = sum_nn / n_taps - mean_n * mean_n
    cov = sum_rn / n_taps - mean_r[None, None] * mean_n
    denom = jnp.sqrt(jnp.maximum(var_r[None, None] * var_n, 1e-12))
    ncc = jnp.where(full & sel_valid[:, None], cov / denom, -1.0)  # (S,K,H,W)

    ok = sel_valid[:, None] & full                     # (S, K, H, W)
    n_ok = jnp.sum(ok, axis=0)
    score = jnp.sum(jnp.where(ok, ncc, 0.0), axis=0) / jnp.maximum(n_ok, 1)
    kth = jnp.min(jnp.where(ok, ncc, 1.0), axis=0)
    score = jnp.where(n_ok >= S, score, -1.0)
    kth = jnp.where(n_ok >= S, kth, -1.0)
    return score, kth
