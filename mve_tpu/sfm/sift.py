"""TPU-native SIFT (reference behavior: libs/sfm/sift.h/.cc).

Reproduces the reference's algorithm — octaves min..max with S samples
(S+3 gaussians, S+2 DoGs per octave, sift.h:183-190), 26-neighbor extrema,
iterative 3D quadratic localization with contrast/edge filtering
(sift.cc:340-489), 36-bin orientation histograms (sift.cc:599-700) and
4x4x8 trilinear descriptors with 0.2 clamping (sift.cc:702-845) — but
re-architected for TPU:

- Scale-space construction, DoGs and extrema masks are dense jitted
  tensor ops (separable convs + stacked comparisons) over the whole
  pyramid — no per-pixel scalar loops.
- Keypoint refinement evaluates all nine DoG derivative stencils densely
  once, then refines all candidates in parallel via batched gathers
  (the reference's 5-step re-centering loop becomes a lax.fori_loop over
  a fixed iteration count on the whole keypoint batch).
- Orientation histograms and descriptors gather fixed-size windows per
  keypoint (masked to the scale-dependent radius) and reduce with
  one-hot matmuls — a shape XLA tiles onto the VPU/MXU.

Host code handles only the variable-size bookkeeping (candidate
compaction between stages), with keypoint batches padded to buckets to
bound recompilation.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import image_tools


@dataclasses.dataclass(frozen=True)
class SiftOptions:
    """Defaults match the reference (sift.h:48-109)."""

    num_samples_per_octave: int = 3
    min_octave: int = 0
    max_octave: int = 4
    contrast_threshold: float = -1.0  # <0 => 0.02 / samples
    edge_ratio_threshold: float = 10.0
    base_blur_sigma: float = 1.6
    inherent_blur_sigma: float = 0.5
    # TPU batching knobs (not in the reference):
    max_keypoints_per_octave: int = 4096
    max_orientations_per_keypoint: int = 3

    @property
    def eff_contrast_threshold(self) -> float:
        if self.contrast_threshold >= 0:
            return self.contrast_threshold
        return 0.02 / self.num_samples_per_octave


@dataclasses.dataclass
class SiftResult:
    """Final descriptors; coordinates are in input-image pixels
    (sift.cc:543-546 scale_factor mapping)."""

    x: np.ndarray  # (N,)
    y: np.ndarray  # (N,)
    scale: np.ndarray  # (N,) absolute scale
    orientation: np.ndarray  # (N,)
    descriptors: np.ndarray  # (N, 128) float32, unit norm

    def __len__(self):
        return len(self.x)


# ---------------------------------------------------------------------------
# octave construction (sift.cc:170-263)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_samples", "base_sigma", "has_sigma"))
def _build_octave(img, num_samples: int, base_sigma: float, has_sigma: float):
    """One octave: S+3 gaussians and S+2 DoGs, stacked along axis 0.

    img: (H, W) float32 at octave resolution with blur `has_sigma`.
    """
    if base_sigma > has_sigma:
        sigma0 = math.sqrt(base_sigma**2 - has_sigma**2)
        base = image_tools.blur_gaussian(img[:, :, None], sigma0)[:, :, 0]
    else:
        base = img
    imgs = [base]
    k = 2.0 ** (1.0 / num_samples)
    sigma = base_sigma
    for _ in range(num_samples + 2):
        sigmak = sigma * k
        blur = math.sqrt(sigmak**2 - sigma**2)
        imgs.append(image_tools.blur_gaussian(imgs[-1][:, :, None], blur)[:, :, 0])
        sigma = sigmak
    gauss = jnp.stack(imgs)  # (S+3, H, W)
    dogs = gauss[1:] - gauss[:-1]  # (S+2, H, W)
    return gauss, dogs


# ---------------------------------------------------------------------------
# extrema detection (sift.cc:264-336)
# ---------------------------------------------------------------------------

@jax.jit
def _extrema_mask(dogs):
    """Strict 26-neighbor extrema of the middle DoGs.

    dogs: (S+2, H, W). Returns bool mask (S, H, W) for samples 0..S-1
    (the reference's kp.sample) — an extremum of the 3x3x3 neighborhood
    centered at dogs[s+1].
    """
    d = dogs
    # 3x3 max/min per image via two 1D reduce_windows.
    def pool(x, op, init):
        x = jax.lax.reduce_window(x, init, op, (1, 3, 1), (1, 1, 1), "SAME")
        return jax.lax.reduce_window(x, init, op, (1, 1, 3), (1, 1, 1), "SAME")

    mx = pool(d, jax.lax.max, -jnp.inf)
    mn = pool(d, jax.lax.min, jnp.inf)
    center = d[1:-1]
    # Strict comparison against all 26 neighbors: full 3x3 pools of the
    # +-1 scale planes, 8-neighbor (center-excluded) pools of the own
    # plane. A tie with any neighbor rejects (matches the reference's >=).
    nb_max_excl = jnp.maximum(jnp.maximum(mx[:-2], mx[2:]), _pool3x3_excl_center(center))
    nb_min_excl = jnp.minimum(jnp.minimum(mn[:-2], mn[2:]), _pool3x3_excl_center_min(center))
    largest = center > nb_max_excl
    smallest = center < nb_min_excl
    mask = largest | smallest
    # Reject the 1-pixel image boundary (reference iterates y,x in [1, dim-2]).
    mask = mask.at[:, 0, :].set(False).at[:, -1, :].set(False)
    mask = mask.at[:, :, 0].set(False).at[:, :, -1].set(False)
    return mask


def _pool3x3_excl_center(x):
    """Max over the 8 spatial neighbors (center excluded). x: (S, H, W)."""
    pads = []
    big = -jnp.inf
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=big)
    H, W = x.shape[1], x.shape[2]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            pads.append(padded[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W])
    return functools.reduce(jnp.maximum, pads)


def _pool3x3_excl_center_min(x):
    small = jnp.inf
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=small)
    H, W = x.shape[1], x.shape[2]
    pads = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            pads.append(padded[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W])
    return functools.reduce(jnp.minimum, pads)


# ---------------------------------------------------------------------------
# keypoint localization (sift.cc:340-489)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("contrast_thr", "edge_thr", "num_samples"))
def _localize_keypoints(dogs, ix, iy, isamp, valid, contrast_thr: float,
                        edge_thr: float, num_samples: int):
    """Batched 3D quadratic localization with up-to-5-step re-centering.

    dogs: (S+2, H, W); ix/iy/isamp: (N,) int32 candidates; valid: (N,) bool.
    Returns (x, y, sample, keep) with the reference's rejection rules.
    """
    H, W = dogs.shape[1], dogs.shape[2]

    def derivs(ix, iy, isamp):
        """All first/second DoG derivatives at (isamp+1, iy, ix) via gathers."""
        def at(ds, dy, dx):
            return dogs[isamp + 1 + ds, jnp.clip(iy + dy, 0, H - 1), jnp.clip(ix + dx, 0, W - 1)]

        Dx = (at(0, 0, 1) - at(0, 0, -1)) * 0.5
        Dy = (at(0, 1, 0) - at(0, -1, 0)) * 0.5
        Ds = (at(1, 0, 0) - at(-1, 0, 0)) * 0.5
        c = at(0, 0, 0)
        Dxx = at(0, 0, 1) + at(0, 0, -1) - 2 * c
        Dyy = at(0, 1, 0) + at(0, -1, 0) - 2 * c
        Dss = at(1, 0, 0) + at(-1, 0, 0) - 2 * c
        Dxy = (at(0, 1, 1) + at(0, -1, -1) - at(0, 1, -1) - at(0, -1, 1)) * 0.25
        Dxs = (at(1, 0, 1) + at(-1, 0, -1) - at(1, 0, -1) - at(-1, 0, 1)) * 0.25
        Dys = (at(1, 1, 0) + at(-1, -1, 0) - at(1, -1, 0) - at(-1, 1, 0)) * 0.25
        return Dx, Dy, Ds, Dxx, Dyy, Dss, Dxy, Dxs, Dys, c

    def solve(Dx, Dy, Ds, Dxx, Dyy, Dss, Dxy, Dxs, Dys):
        """Solve A [fx fy fs]^T = -[Dx Dy Ds]^T for the 3x3 Hessian."""
        # Closed-form 3x3 inverse (adjugate).
        a, b, c_ = Dxx, Dxy, Dxs
        d, e, f = Dxy, Dyy, Dys
        g, h, i = Dxs, Dys, Dss
        det = a * (e * i - f * h) - b * (d * i - f * g) + c_ * (d * h - e * g)
        singular = jnp.abs(det) < 1e-15
        det_safe = jnp.where(singular, 1.0, det)
        A = (e * i - f * h) / det_safe
        B = (c_ * h - b * i) / det_safe
        C = (b * f - c_ * e) / det_safe
        D = (f * g - d * i) / det_safe
        E = (a * i - c_ * g) / det_safe
        F = (c_ * d - a * f) / det_safe
        G = (d * h - e * g) / det_safe
        Hh = (b * g - a * h) / det_safe
        I = (a * e - b * d) / det_safe
        fx = -(A * Dx + B * Dy + C * Ds)
        fy = -(D * Dx + E * Dy + F * Ds)
        fs = -(G * Dx + Hh * Dy + I * Ds)
        return (
            jnp.where(singular, 0.0, fx),
            jnp.where(singular, 0.0, fy),
            jnp.where(singular, 0.0, fs),
            singular,
        )

    def body(_, state):
        ix, iy, done = state[0], state[1], state[6]
        d = derivs(ix, iy, isamp)
        fx, fy, fs, singular = solve(*d[:9])
        dx = jnp.where((fx > 0.6) & (ix < W - 2), 1, 0) + jnp.where((fx < -0.6) & (ix > 1), -1, 0)
        dy = jnp.where((fy > 0.6) & (iy < H - 2), 1, 0) + jnp.where((fy < -0.6) & (iy > 1), -1, 0)
        move = (dx != 0) | (dy != 0)
        step = move & ~done & ~singular
        new_ix = jnp.where(step, ix + dx, ix)
        new_iy = jnp.where(step, iy + dy, iy)
        new_done = done | ~move | singular
        return (new_ix, new_iy, fx, fy, fs, singular, new_done)

    state = (ix, iy, jnp.zeros_like(ix, jnp.float32), jnp.zeros_like(ix, jnp.float32),
             jnp.zeros_like(ix, jnp.float32), jnp.zeros_like(valid), jnp.zeros_like(valid))
    state = jax.lax.fori_loop(0, 5, body, state)
    ixf, iyf, fx, fy, fs, singular, _ = state
    # Final derivatives at the settled pixel for the value/edge tests.
    Dx, Dy, Ds, Dxx, Dyy, Dss, Dxy, Dxs, Dys, center = derivs(ixf, iyf, isamp)
    fx = jnp.where(singular, 0.0, fx)
    fy = jnp.where(singular, 0.0, fy)
    fs = jnp.where(singular, 0.0, fs)
    val = center + 0.5 * (Dx * fx + Dy * fy + Ds * fs)
    tr = Dxx + Dyy
    det2 = Dxx * Dyy - Dxy * Dxy
    score = tr * tr / jnp.where(jnp.abs(det2) < 1e-30, 1e-30, det2)
    score_thr = (edge_thr + 1.0) ** 2 / edge_thr

    x = ixf.astype(jnp.float32) + fx
    y = iyf.astype(jnp.float32) + fy
    s = isamp.astype(jnp.float32) + fs
    keep = (
        valid
        & ~singular
        & (jnp.abs(val) >= contrast_thr)
        & (score >= 0.0)
        & (score <= score_thr)
        & (jnp.abs(fx) <= 1.5)
        & (jnp.abs(fy) <= 1.5)
        & (jnp.abs(fs) <= 1.0)
        & (s >= -1.0)
        & (s <= float(num_samples))
        & (x >= 0.0)
        & (x <= float(W - 1))
        & (y >= 0.0)
        & (y <= float(H - 1))
    )
    return x, y, s, keep


# ---------------------------------------------------------------------------
# gradient/orientation images (sift.cc:557-597)
# ---------------------------------------------------------------------------

@jax.jit
def _grad_ori(gauss):
    """Gradient magnitude and orientation in [0, 2pi). gauss: (L, H, W)."""
    dx = jnp.zeros_like(gauss)
    dy = jnp.zeros_like(gauss)
    dx = dx.at[:, :, 1:-1].set(0.5 * (gauss[:, :, 2:] - gauss[:, :, :-2]))
    dy = dy.at[:, 1:-1, :].set(0.5 * (gauss[:, 2:, :] - gauss[:, :-2, :]))
    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.arctan2(dy, dx)
    ori = jnp.where(ori < 0, ori + 2 * jnp.pi, ori)
    return mag, ori


# ---------------------------------------------------------------------------
# orientation assignment (sift.cc:599-700)
# ---------------------------------------------------------------------------

_ORI_WIN = 20  # max window radius: sigma<=4.04 => win = int(sigma*4.5) <= 18


@functools.partial(jax.jit, static_argnames=("num_samples", "base_sigma", "max_ori"))
def _assign_orientations(grad, ori, x, y, samp, valid,
                         num_samples: int, base_sigma: float, max_ori: int):
    """36-bin weighted histogram -> up to max_ori interpolated peaks.

    grad/ori: (S+3, H, W); x/y/samp: (N,) refined keypoints (octave coords).
    Returns (orientations (N, max_ori), ori_valid (N, max_ori)).
    """
    H, W = grad.shape[1], grad.shape[2]
    nbins = 36
    R = _ORI_WIN

    ix = (x + 0.5).astype(jnp.int32)
    iy = (y + 0.5).astype(jnp.int32)
    isamp = jnp.round(samp).astype(jnp.int32)
    sigma = base_sigma * jnp.exp2((samp + 1.0) / num_samples)  # relative scale
    win = (sigma * 1.5 * 3.0).astype(jnp.int32)
    inside = (ix >= win) & (ix + win < W) & (iy >= win) & (iy + win < H)

    dxs = jnp.arange(-R, R + 1, dtype=jnp.float32)
    dys = jnp.arange(-R, R + 1, dtype=jnp.float32)
    DX, DY = jnp.meshgrid(dxs, dys, indexing="xy")  # (2R+1, 2R+1)

    # Edge-pad once so every keypoint's window is one contiguous
    # dynamic_slice (a block gather the TPU handles at full bandwidth)
    # instead of (2R+1)^2 scattered element gathers. Out-of-image taps
    # read edge values but are masked by in_win, and keypoints whose
    # support window leaves the image are rejected by `inside`, so the
    # results are bit-identical for every surviving keypoint.
    grad_pad = jnp.pad(grad, ((0, 0), (R, R), (R, R)), mode="edge")
    ori_pad = jnp.pad(ori, ((0, 0), (R, R), (R, R)), mode="edge")

    def per_kp(ix1, iy1, is1, x1, y1, sigma1, win1):
        level = jnp.clip(is1 + 1, 0, grad.shape[0] - 1)
        gm = jax.lax.dynamic_slice(
            grad_pad, (level, iy1, ix1), (1, 2 * R + 1, 2 * R + 1))[0]
        go = jax.lax.dynamic_slice(
            ori_pad, (level, iy1, ix1), (1, 2 * R + 1, 2 * R + 1))[0]
        dxf = x1 - ix1
        dyf = y1 - iy1
        dist = (DX - dxf) ** 2 + (DY - dyf) ** 2
        maxdist = win1.astype(jnp.float32) ** 2 + 0.5
        in_win = (dist <= maxdist) & (jnp.abs(DX) <= win1) & (jnp.abs(DY) <= win1)
        sig_w = sigma1 * 1.5
        weight = jnp.exp(-dist / (2.0 * sig_w * sig_w))
        contrib = jnp.where(in_win, gm * weight, 0.0)
        bin_idx = jnp.clip((nbins * go / (2 * jnp.pi)).astype(jnp.int32), 0, nbins - 1)
        # Histogram as a one-hot contraction instead of a scatter-add:
        # TPU serializes scatters, but sum-over-taps against a one-hot
        # bin matrix is a single MXU matmul.
        onehot = (bin_idx.reshape(-1)[:, None]
                  == jnp.arange(nbins)[None, :]).astype(contrib.dtype)
        hist = contrib.reshape(-1) @ onehot
        return hist

    hist = jax.vmap(per_kp)(ix, iy, isamp, x, y, sigma, win)  # (N, 36)

    # Circular box smoothing x6 (sift.cc:663-675).
    for _ in range(6):
        hist = (jnp.roll(hist, 1, axis=-1) + hist + jnp.roll(hist, -1, axis=-1)) / 3.0

    maxh = jnp.max(hist, axis=-1, keepdims=True)
    h0 = jnp.roll(hist, 1, axis=-1)
    h2 = jnp.roll(hist, -1, axis=-1)
    is_peak = (hist > 0.8 * maxh) & (hist > h0) & (hist > h2)
    denom = h0 - 2.0 * hist + h2
    frac = -0.5 * (h2 - h0) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    bin_centers = jnp.arange(nbins, dtype=jnp.float32)
    peak_ori = 2.0 * jnp.pi * (frac + bin_centers + 0.5) / nbins

    # Select up to max_ori peaks, strongest first.
    peak_score = jnp.where(is_peak, hist, -jnp.inf)
    top_idx = jnp.argsort(-peak_score, axis=-1)[:, :max_ori]  # (N, max_ori)
    top_valid = jnp.take_along_axis(is_peak, top_idx, axis=-1) & valid[:, None] & inside[:, None]
    top_ori = jnp.take_along_axis(peak_ori, top_idx, axis=-1)
    return top_ori, top_valid


# ---------------------------------------------------------------------------
# descriptor extraction (sift.cc:702-845)
# ---------------------------------------------------------------------------

_DESC_WIN = 44  # max: sqrt(2)*3*sigma*(4+1)/2 with sigma<=4.04 => <=43


@functools.partial(jax.jit, static_argnames=("num_samples", "base_sigma", "chunk"))
def _compute_descriptors(grad, ori, x, y, samp, orientation, valid,
                         num_samples: int, base_sigma: float, chunk: int = 256):
    """4x4 spatial x 8 orientation trilinear descriptor, batched.

    Returns (desc (N, 128), keep (N,)).
    """
    H, W = grad.shape[1], grad.shape[2]
    PXB, OHB = 4, 8
    R = _DESC_WIN
    chunk = min(chunk, x.shape[0])

    dxs = jnp.arange(-R, R + 1, dtype=jnp.float32)
    DX, DY = jnp.meshgrid(dxs, dxs, indexing="xy")

    # Contiguous-window gathers (see _assign_orientations): one
    # dynamic_slice per keypoint on edge-padded planes.
    grad_pad = jnp.pad(grad, ((0, 0), (R, R), (R, R)), mode="edge")
    ori_pad = jnp.pad(ori, ((0, 0), (R, R), (R, R)), mode="edge")

    def per_kp(x1, y1, samp1, ori1):
        ix1 = (x1 + 0.5).astype(jnp.int32)
        iy1 = (y1 + 0.5).astype(jnp.int32)
        is1 = jnp.round(samp1).astype(jnp.int32)
        dxf = x1 - ix1
        dyf = y1 - iy1
        sigma1 = base_sigma * jnp.exp2((samp1 + 1.0) / num_samples)
        binsize = 3.0 * sigma1
        win1 = (jnp.sqrt(2.0) * binsize * (PXB + 1) * 0.5).astype(jnp.int32)
        ok = (ix1 >= win1) & (ix1 + win1 < W) & (iy1 >= win1) & (iy1 + win1 < H)

        level = jnp.clip(is1 + 1, 0, grad.shape[0] - 1)
        gm = jax.lax.dynamic_slice(
            grad_pad, (level, iy1, ix1), (1, 2 * R + 1, 2 * R + 1))[0]
        go = jax.lax.dynamic_slice(
            ori_pad, (level, iy1, ix1), (1, 2 * R + 1, 2 * R + 1))[0]

        theta = go - ori1
        theta = jnp.where(theta < 0, theta + 2 * jnp.pi, theta)
        winx = DX - dxf
        winy = DY - dyf
        sino = jnp.sin(ori1)
        coso = jnp.cos(ori1)
        binoff = (PXB - 1) / 2.0
        binx = (coso * winx + sino * winy) / binsize + binoff
        biny = (-sino * winx + coso * winy) / binsize + binoff
        bint = theta * OHB / (2 * jnp.pi) - 0.5

        gw = jnp.exp(-((binx - binoff) ** 2 + (biny - binoff) ** 2) / (2.0 * (0.5 * PXB) ** 2))
        in_win = (jnp.abs(DX) <= win1) & (jnp.abs(DY) <= win1)
        contrib = jnp.where(in_win, gm * gw, 0.0)

        # Trilinear soft-binning as SEPARABLE hat-weight contractions —
        # the TPU replacement for the reference's per-tap scatter into
        # the 128-bin histogram (scatters serialize on TPU; this form is
        # fused elementwise work plus one small batched matmul on the
        # MXU). hat(d) = max(0, 1-|d|) reproduces the two-corner linear
        # weights exactly, including the implicit drop of out-of-range
        # spatial bins (the hat is zero there); the orientation axis
        # wraps, so its distance is circular.
        tflat = contrib.reshape(-1)                       # (T,)
        bxf = binx.reshape(-1)
        byf = biny.reshape(-1)
        btf = bint.reshape(-1)
        bins4 = jnp.arange(PXB, dtype=jnp.float32)
        bins8 = jnp.arange(OHB, dtype=jnp.float32)
        wxh = jnp.maximum(0.0, 1.0 - jnp.abs(bxf[:, None] - bins4))   # (T,4)
        wyh = jnp.maximum(0.0, 1.0 - jnp.abs(byf[:, None] - bins4))   # (T,4)
        dt = jnp.abs(jnp.mod(btf[:, None] - bins8, OHB))
        dt = jnp.minimum(dt, OHB - dt)
        wth = jnp.maximum(0.0, 1.0 - dt)                              # (T,8)
        # desc[by, bx, bt] = sum_t contrib wy wx wt
        M = (tflat[:, None, None] * wyh[:, :, None] * wxh[:, None, :])
        desc = jnp.einsum("tyx,to->yxo", M, wth).reshape(-1)
        # Normalize, clamp 0.2, renormalize (sift.cc:832-840).
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-12)
        desc = jnp.minimum(desc, 0.2)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-12)
        return desc, ok

    desc, ok = jax.lax.map(
        lambda args: jax.vmap(per_kp)(*args),
        (x.reshape(-1, chunk), y.reshape(-1, chunk), samp.reshape(-1, chunk),
         orientation.reshape(-1, chunk)),
    )
    desc = desc.reshape(-1, PXB * PXB * OHB)
    ok = ok.reshape(-1) & valid
    return desc.astype(jnp.float32), ok


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _pad_to_bucket(n: int, cap: int, chunk: int = 256) -> int:
    """Pad count to the next power of two >= chunk (each distinct shape
    is a separate XLA compile; log buckets bound that count)."""
    size = chunk
    while size < n and size < cap:
        size *= 2
    return min(size, cap) if cap >= chunk else size


@functools.partial(jax.jit, static_argnames=(
    "num_samples", "base_sigma", "has_sigma", "cap", "contrast_thr", "edge_thr"))
def _octave_detect(oct_img, num_samples: int, base_sigma: float,
                   has_sigma: float, cap: int, contrast_thr: float,
                   edge_thr: float):
    """Fused per-octave stage 1: scale space + DoGs + extrema + top-`cap`
    candidate selection + batched localization — one dispatch.

    Returns (gauss, x, y, s, keep): gauss stays on device for stage 2.
    """
    gauss, dogs = _build_octave(oct_img, num_samples, base_sigma, has_sigma)
    mask = _extrema_mask(dogs)  # (S, H, W)
    S, H, W = mask.shape
    # Candidate strength = |DoG| at the center sample; masked to extrema.
    strength = jnp.where(mask, jnp.abs(dogs[1 : 1 + S]), -1.0)
    flat = strength.reshape(-1)
    k = min(cap, flat.shape[0])
    vals, idx = jax.lax.top_k(flat, k)
    valid = vals > 0.0
    isamp = (idx // (H * W)).astype(jnp.int32)
    rem = idx % (H * W)
    iy = (rem // W).astype(jnp.int32)
    ix = (rem % W).astype(jnp.int32)
    # Clamp invalid slots to interior pixels so gathers stay in range.
    ix = jnp.where(valid, ix, 2)
    iy = jnp.where(valid, iy, 2)
    isamp = jnp.where(valid, isamp, 0)
    x, y, s, keep = _localize_keypoints(
        dogs, ix, iy, isamp, valid, contrast_thr, edge_thr, num_samples)
    return gauss, x, y, s, keep


@functools.partial(jax.jit, static_argnames=("num_samples", "base_sigma", "max_ori"))
def _octave_orientations(gauss, x, y, samp, valid, num_samples: int,
                         base_sigma: float, max_ori: int):
    """Fused stage 2: gradient images + orientation histograms."""
    grad, orient = _grad_ori(gauss)
    oris, ori_valid = _assign_orientations(
        grad, orient, x, y, samp, valid, num_samples, base_sigma, max_ori)
    return grad, orient, oris, ori_valid


def _to_gray_f32(image) -> np.ndarray:
    """Grayscale conversion in pure numpy: image_tools.desaturate is an
    eager-jnp device path, and calling it per image costs several tunnel
    round trips each on the remote-TPU backend (~2.5s of the r04 feature
    stage). Same luminosity weights (image_tools.desaturate default)."""
    img = np.asarray(image)
    if img.ndim == 3:
        if img.shape[2] >= 3:
            f = image_tools.to_float(img)
            img = (0.21 * f[:, :, 0] + 0.72 * f[:, :, 1] + 0.07 * f[:, :, 2])
        else:
            img = image_tools.to_float(img)[:, :, 0]
    else:
        img = image_tools.to_float(img)
    return np.asarray(img, np.float32)


@jax.jit
def _compact_keypoints(x, y, s, keep):
    """Pack valid keypoints into the first half of the slot array.

    _octave_detect's top_k orders candidates by extremum strength, and
    the argsort on validity is stable, so the surviving keypoints stay
    strongest-first and any overflow past cap/2 drops the weakest.
    Real keypoint counts run ~3x below cap (top_k admission is
    deliberately generous), so the halved slot count removes half the
    orientation/descriptor work without touching real keypoints."""
    cap2 = x.shape[0] // 2
    order = jnp.argsort(~keep, stable=True)[:cap2]
    xd = x[order]
    yd = y[order]
    sd = s[order]
    kd = keep[order]
    xd = jnp.where(kd, xd, 8.0)
    yd = jnp.where(kd, yd, 8.0)
    sd = jnp.where(kd, sd, 0.0)
    return xd, yd, sd, kd


@functools.partial(jax.jit, static_argnames=("max_ori",))
def _compact_slots(x, y, s, oris, ori_valid, keep, max_ori: int):
    """Device-side slot compaction: expand keypoints x orientations to
    flat slots and pack the valid ones into the first `cap` entries by a
    stable argsort on validity (overflow beyond cap drops the lowest-
    priority tail; cap is already the per-octave keypoint budget)."""
    cap = x.shape[0]
    valid_f = (ori_valid & keep[:, None]).reshape(-1)       # (cap*max_ori,)
    order = jnp.argsort(~valid_f, stable=True)[:cap]
    xd = jnp.repeat(x, max_ori)[order]
    yd = jnp.repeat(y, max_ori)[order]
    sd = jnp.repeat(s, max_ori)[order]
    od = oris.reshape(-1)[order]
    vd = valid_f[order]
    # Clamp invalid slots to safe interior coords for the window gathers.
    xd = jnp.where(vd, xd, 8.0)
    yd = jnp.where(vd, yd, 8.0)
    sd = jnp.where(vd, sd, 0.0)
    return xd, yd, sd, od, vd


def _octave_full(oct_img, num_samples: int, base_sigma: float,
                 has_sigma: float, cap: int, contrast_thr: float,
                 edge_thr: float, max_ori: int):
    """One octave end-to-end WITHOUT host round trips: detect +
    orientations (on all cap slots, masked) + device-side compaction +
    descriptors. The previous batch path synced to the host between
    every stage for compaction — ~18 tunnel round trips per scene; this
    chains four async dispatches. (Deliberately NOT one fused jit: the
    merged program compiles pathologically slowly on the remote-compile
    backend, while these four programs are the round-3 shapes the
    compiler already handles.)

    Returns (x, y, s, ori, desc, ok) all padded to cap.
    """
    gauss, x, y, s, keep = _octave_detect(
        oct_img, num_samples, base_sigma, has_sigma, cap, contrast_thr,
        edge_thr)
    x, y, s, keep = _compact_keypoints(x, y, s, keep)
    grad, orient, oris, ori_valid = _octave_orientations(
        gauss, x, y, s, keep, num_samples, base_sigma, max_ori)
    xd, yd, sd, od, vd = _compact_slots(x, y, s, oris, ori_valid, keep,
                                        max_ori)
    desc, ok = _compute_descriptors(grad, orient, xd, yd, sd, od, vd,
                                    num_samples, base_sigma)
    return xd, yd, sd, od, desc, ok & vd


@jax.jit
def _half_size_batch(batch):
    """Jitted batched gaussian half-size: ONE device program per octave
    step. (An unjitted vmap executes op-by-op — tens of eager dispatches
    each paying tunnel latency; this was the single largest cost of the
    r04 feature stage at ~0.3-0.9s per octave.)"""
    return jax.vmap(lambda im: image_tools.rescale_half_size_gaussian(
        im[:, :, None])[:, :, 0])(batch)


_MAX_FEATURE_BATCH = 10  # views per vmapped dispatch: the octave
# working set (pyramids + gradients at full resolution) is ~7MB/view
# per array; 100-view scenes OOM HBM if vmapped whole. 10 matches the
# benchmark scene size so large scenes reuse the same compiled shapes.


def detect_and_describe_batch(images, options: SiftOptions = SiftOptions()):
    """SIFT over a batch of SAME-SHAPE images with vmapped octave stages:
    a handful of dispatches per octave for the whole batch instead of
    per image. Batches larger than _MAX_FEATURE_BATCH process in
    sub-batches (the last one padded to the same shape, results
    discarded) so HBM stays bounded at any scene size.

    Returns a list of SiftResult (one per image).
    """
    if len(images) > _MAX_FEATURE_BATCH:
        out = []
        for i in range(0, len(images), _MAX_FEATURE_BATCH):
            sub = list(images[i:i + _MAX_FEATURE_BATCH])
            n_real = len(sub)
            if n_real < _MAX_FEATURE_BATCH:
                sub += [sub[-1]] * (_MAX_FEATURE_BATCH - n_real)
            out.extend(detect_and_describe_batch(sub, options)[:n_real])
        return out
    grays = [_to_gray_f32(im) for im in images]
    if len(set(g.shape for g in grays)) != 1:
        return [detect_and_describe(g, options) for g in grays]
    opts = options
    S = opts.num_samples_per_octave
    B = len(grays)
    batch = jnp.asarray(np.stack(grays))

    results = [dict(x=[], y=[], scale=[], ori=[], desc=[]) for _ in range(B)]

    img_sigma = opts.inherent_blur_sigma
    base = batch
    o = max(0, opts.min_octave)
    # Note: min_octave=-1 (upsampled) falls back to the per-image path.
    if opts.min_octave < 0:
        return [detect_and_describe(g, options) for g in grays]
    for _ in range(opts.min_octave):
        base = _half_size_batch(base)

    # One fused dispatch per octave; results fetched asynchronously at
    # the end (device round trips were the old path's dominant cost).
    pending = []
    while o <= opts.max_octave and base.shape[1] >= 16 and base.shape[2] >= 16:
        H, W = base.shape[1], base.shape[2]
        cap = min(opts.max_keypoints_per_octave, max(256, S * H * W // 64))
        cap = _pad_to_bucket(cap, opts.max_keypoints_per_octave)
        full = jax.vmap(lambda im: _octave_full(
            im, S, opts.base_blur_sigma, float(img_sigma), cap,
            opts.eff_contrast_threshold, opts.edge_ratio_threshold,
            opts.max_orientations_per_keypoint))
        pending.append((o, full(base)))
        base = _half_size_batch(base)
        img_sigma = opts.base_blur_sigma
        o += 1

    for o, (xd, yd, sd, od, desc, ok) in pending:
        ok_np = np.asarray(ok)
        xd = np.asarray(xd)
        yd = np.asarray(yd)
        sd = np.asarray(sd)
        od = np.asarray(od)
        desc_np = np.asarray(desc)
        scale_factor = 2.0 ** o
        for b in range(B):
            sel = ok_np[b]
            if not sel.any():
                continue
            results[b]["x"].append(scale_factor * (xd[b][sel] + 0.5) - 0.5)
            results[b]["y"].append(scale_factor * (yd[b][sel] + 0.5) - 0.5)
            results[b]["scale"].append(
                opts.base_blur_sigma * 2.0 ** (o + (sd[b][sel] + 1.0) / S))
            results[b]["ori"].append(od[b][sel])
            results[b]["desc"].append(desc_np[b][sel])

    out = []
    for r in results:
        if r["x"]:
            out.append(SiftResult(
                np.concatenate(r["x"]).astype(np.float32),
                np.concatenate(r["y"]).astype(np.float32),
                np.concatenate(r["scale"]).astype(np.float32),
                np.concatenate(r["ori"]).astype(np.float32),
                np.concatenate(r["desc"]).astype(np.float32)))
        else:
            out.append(SiftResult(
                np.zeros(0, np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.float32), np.zeros(0, np.float32),
                np.zeros((0, 128), np.float32)))
    return out


def detect_and_describe(image, options: SiftOptions = SiftOptions()) -> SiftResult:
    """Run SIFT on one grayscale image; returns descriptors in input-pixel
    coordinates (equivalent of Sift::process + get_descriptors,
    sift.cc:42-168)."""
    img = _to_gray_f32(image)

    opts = options
    S = opts.num_samples_per_octave

    all_x, all_y, all_scale, all_ori, all_desc = [], [], [], [], []

    # Build per-octave base images on host (cheap; shapes vary per octave).
    octave_inputs = []
    if opts.min_octave < 0:
        up = np.asarray(image_tools.rescale_double_size(jnp.asarray(img)[:, :, None]))[:, :, 0]
        octave_inputs.append((-1, up, opts.inherent_blur_sigma * 2.0))
    base = img
    img_sigma = opts.inherent_blur_sigma
    for i in range(opts.min_octave):
        base = np.asarray(image_tools.rescale_half_size_gaussian(jnp.asarray(base)[:, :, None]))[:, :, 0]
    for o in range(max(0, opts.min_octave), opts.max_octave + 1):
        if base.shape[0] < 16 or base.shape[1] < 16:
            break
        octave_inputs.append((o, base, img_sigma))
        base = np.asarray(image_tools.rescale_half_size_gaussian(jnp.asarray(base)[:, :, None]))[:, :, 0]
        img_sigma = opts.base_blur_sigma

    for oct_idx, oct_img, has_sigma in octave_inputs:
        # Stage 1 (one dispatch): scale space -> extrema -> localization.
        cap = min(opts.max_keypoints_per_octave,
                  max(256, S * oct_img.shape[0] * oct_img.shape[1] // 64))
        cap = _pad_to_bucket(cap, opts.max_keypoints_per_octave)
        gauss, x, y, s, keep = _octave_detect(
            jnp.asarray(oct_img), S, opts.base_blur_sigma, float(has_sigma),
            cap, opts.eff_contrast_threshold, opts.edge_ratio_threshold)
        keep_np = np.asarray(keep)
        if not keep_np.any():
            continue
        x_np, y_np, s_np = np.asarray(x)[keep_np], np.asarray(y)[keep_np], np.asarray(s)[keep_np]

        n2 = len(x_np)
        npad2 = _pad_to_bucket(n2, opts.max_keypoints_per_octave)
        pad2 = npad2 - n2

        def p(a, fill=0.0):
            return jnp.asarray(np.pad(a.astype(np.float32), (0, pad2), constant_values=fill))

        kx, ky, ks = p(x_np, 64.0), p(y_np, 64.0), p(s_np)
        kvalid = jnp.asarray(np.arange(npad2) < n2)
        # Stage 2 (one dispatch): gradients + orientations.
        grad, orient, oris, ori_valid = _octave_orientations(
            gauss, kx, ky, ks, kvalid, S, opts.base_blur_sigma,
            opts.max_orientations_per_keypoint)

        ov_np = np.asarray(ori_valid)
        oris_np = np.asarray(oris)
        kp_rep, ori_flat = np.nonzero(ov_np)
        if len(kp_rep) == 0:
            continue
        dx_np = x_np[np.clip(kp_rep, 0, n2 - 1)]
        dy_np = y_np[np.clip(kp_rep, 0, n2 - 1)]
        ds_np = s_np[np.clip(kp_rep, 0, n2 - 1)]
        do_np = oris_np[kp_rep, ori_flat]

        n3 = len(kp_rep)
        npad3 = _pad_to_bucket(n3, opts.max_keypoints_per_octave * opts.max_orientations_per_keypoint)
        pad3 = npad3 - n3
        ddx = jnp.asarray(np.pad(dx_np, (0, pad3), constant_values=64.0).astype(np.float32))
        ddy = jnp.asarray(np.pad(dy_np, (0, pad3), constant_values=64.0).astype(np.float32))
        dds = jnp.asarray(np.pad(ds_np, (0, pad3)).astype(np.float32))
        ddo = jnp.asarray(np.pad(do_np, (0, pad3)).astype(np.float32))
        dvalid = jnp.asarray(np.arange(npad3) < n3)

        desc, keep_d = _compute_descriptors(
            grad, orient, ddx, ddy, dds, ddo, dvalid, S, opts.base_blur_sigma)
        keep_d_np = np.asarray(keep_d)
        if not keep_d_np.any():
            continue
        fx = np.asarray(ddx)[keep_d_np]
        fy = np.asarray(ddy)[keep_d_np]
        fs = np.asarray(dds)[keep_d_np]
        fo = np.asarray(ddo)[keep_d_np]

        scale_factor = 2.0 ** oct_idx
        all_x.append(scale_factor * (fx + 0.5) - 0.5)
        all_y.append(scale_factor * (fy + 0.5) - 0.5)
        all_scale.append(opts.base_blur_sigma * 2.0 ** (oct_idx + (fs + 1.0) / S))
        all_ori.append(fo)
        all_desc.append(np.asarray(desc)[keep_d_np])

    if not all_x:
        return SiftResult(
            np.zeros(0, np.float32), np.zeros(0, np.float32), np.zeros(0, np.float32),
            np.zeros(0, np.float32), np.zeros((0, 128), np.float32))
    return SiftResult(
        np.concatenate(all_x).astype(np.float32),
        np.concatenate(all_y).astype(np.float32),
        np.concatenate(all_scale).astype(np.float32),
        np.concatenate(all_ori).astype(np.float32),
        np.concatenate(all_desc).astype(np.float32),
    )
