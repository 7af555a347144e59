"""FSSR basis/weight evaluation, batched on device
(reference: libs/fssr/basis_function.h:23-71, basis_function.cc).

The basis is a Gaussian derivative along the sample normal:
    f(d) = <d, n> exp(-|d|^2 / 2 s^2) / (2 pi s^4)
and the (new) weight function is radially symmetric with support 3s:
    w(q) = 1 - 2/3 q + 8/27 q^{3/2} - 1/27 q^2,  q = |d|^2/s^2 < 9.
Because both are symmetric around the normal axis, no per-sample rotation
matrix is needed — everything reduces to dot products, which is what
makes the evaluation one big fused elementwise kernel over influence
pairs.

Derivatives (for Hermite iso-vertex interpolation) are the analytic
world-space gradients. Note: the reference's weight derivative divides by
`scale` once (basis_function.h:147-152) where the chain rule gives
1/scale^2; we use the mathematically consistent form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def evaluate_pairs_indexed(positions, pos, normal, scale, conf, color,
                           pair_v, pair_s, num_segments_arr):
    """Gather pair operands on device and evaluate + segment-sum.

    positions: (V, 3); sample arrays (N, ...); pair_v/pair_s: (P,) int32.
    num_segments_arr: (V,)-shaped dummy fixing the segment count. Returns
    stacked per-voxel sums [vw, w, cw, sw, dvw(3), c(3)] as (V, 10).
    """
    out = evaluate_pairs(positions[pair_v], pos[pair_s], normal[pair_s],
                         scale[pair_s], conf[pair_s], color[pair_s])
    V = num_segments_arr.shape[0]
    flat = jnp.concatenate([
        out["vw"][:, None], out["w"][:, None], out["cw"][:, None],
        out["sw"][:, None], out["dvw"], out["c"]], axis=1)
    return jax.ops.segment_sum(flat, pair_v, num_segments=V)


@functools.partial(jax.jit, static_argnames=("num_voxels",))
def scale_filter_pairs(scale, pair_v, pair_s, num_voxels: int):
    """Per-voxel scale filter on device (iso_octree.cc:104-112): sort
    influence pairs by (voxel, sample scale) and mark pairs whose scale
    exceeds 2x the voxel's 10th-percentile (index count//10) influencing
    scale. Padded pairs carry pair_v == num_voxels and sort to the end of
    their (last) segment with an infinite key.

    Returns (sorted_pair_v, sorted_pair_s, keep_mask), all (Pb,).
    """
    Vb = num_voxels
    pscale = scale[pair_s]
    key_scale = jnp.where(pair_v >= Vb, jnp.inf, pscale)
    s_pv, ss, s_ps = jax.lax.sort((pair_v, key_scale, pair_s), num_keys=2)
    ones = jnp.ones_like(s_pv)
    counts = jax.ops.segment_sum(ones, s_pv, num_segments=Vb + 1)
    starts = jnp.cumsum(counts) - counts
    nth = jnp.clip(starts + counts // 10, starts,
                   starts + jnp.maximum(counts - 1, 0))
    thresh = 2.0 * ss[jnp.clip(nth, 0, ss.shape[0] - 1)]
    keep = (ss <= thresh[s_pv]) & (s_pv < Vb)
    return s_pv, s_ps, keep


@jax.jit
def evaluate_pairs_masked(positions, pos, normal, scale, conf, color,
                          pair_v, pair_s, keep):
    """Evaluate one fixed-size chunk of influence pairs and segment-sum
    per voxel, zeroing masked-out (scale-filtered or padding) pairs.

    positions (Vb, 3); sample arrays (Nb, ...); chunk arrays (CHUNK,).
    Returns (Vb, 10) sums [vw, w, cw, sw, dvw(3), c(3)].
    """
    Vb = positions.shape[0]
    vpos = positions[jnp.minimum(pair_v, Vb - 1)]
    out = evaluate_pairs(vpos, pos[pair_s], normal[pair_s],
                         scale[pair_s], conf[pair_s], color[pair_s])
    flat = jnp.concatenate([
        out["vw"][:, None], out["w"][:, None], out["cw"][:, None],
        out["sw"][:, None], out["dvw"], out["c"]], axis=1)
    flat = jnp.where(keep[:, None], flat, 0.0)
    return jax.ops.segment_sum(flat, jnp.minimum(pair_v, Vb),
                               num_segments=Vb + 1)[:Vb]


@jax.jit
def evaluate_pairs(voxel_pos, sample_pos, sample_normal, sample_scale,
                   sample_conf, sample_color):
    """Evaluate basis*weight contributions for influence pairs.

    All inputs are per-pair arrays: voxel_pos (P,3) the voxel position of
    the pair, sample_* the paired sample attributes. Returns a dict of
    per-pair contributions ready for segment-sum per voxel:
      vw   = f * w * conf
      w    = w * conf
      dvw  = grad(f w) * conf      (P, 3)
      dw   = grad(w) * conf        (P, 3)
      cw   = color weight (normalized gaussian at s/5 * conf)
      c    = color * cw            (P, 3)
      sw   = scale * cw
    """
    d = voxel_pos - sample_pos  # (P, 3)
    s = sample_scale
    s2 = s * s
    dist2 = jnp.sum(d * d, axis=-1)
    x = jnp.sum(d * sample_normal, axis=-1)  # signed distance along normal

    g = jnp.exp(-dist2 / (2.0 * s2))
    value_norm = 2.0 * jnp.pi * s2 * s2
    f = x * g / value_norm

    q = dist2 / s2
    inside = q < 9.0
    sq = jnp.sqrt(jnp.maximum(q, 0.0))
    w = jnp.where(inside, 1.0 - (2.0 / 3.0) * q + (8.0 / 27.0) * q * sq
                  - (1.0 / 27.0) * q * q, 0.0)

    # Gradients (world space).
    # grad f = g/(norm s^2) * ((s^2 - x^2) n - x (d - x n))
    d_perp = d - x[..., None] * sample_normal
    grad_f = (g / (value_norm * s2))[..., None] * (
        (s2 - x * x)[..., None] * sample_normal - x[..., None] * d_perp)
    # grad w = w'(q) * 2 d / s^2, w' = -2/3 + 4/9 sqrt(q) - 2/27 q
    wprime = -2.0 / 3.0 + (4.0 / 9.0) * sq - (2.0 / 27.0) * q
    grad_w = jnp.where(inside[..., None], (2.0 * wprime / s2)[..., None] * d, 0.0)

    conf = sample_conf
    vw = f * w * conf
    wc = w * conf
    dvw = (grad_f * w[..., None] + grad_w * f[..., None]) * conf[..., None]
    dw = grad_w * conf[..., None]

    # Color accumulation (iso_octree.cc:152-158): normalized gaussian with
    # sigma = scale/5.
    sigma_c = s / 5.0
    cw = jnp.exp(-dist2 / (2.0 * sigma_c * sigma_c)) / (
        sigma_c * jnp.sqrt(2.0 * jnp.pi)) * conf
    return {
        "vw": vw, "w": wc, "dvw": dvw, "dw": dw,
        "cw": cw, "c": sample_color * cw[..., None], "sw": s * cw,
    }
