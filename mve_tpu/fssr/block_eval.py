"""Dense block evaluation of the FSSR implicit function.

The pair-list evaluator (iso_octree.evaluate_at_positions' original
backend) is TPU-hostile: it sorts tens of millions of (voxel, sample)
pairs on device for the per-voxel scale filter, gathers pair operands
through random indices, and scatter-adds into segments — all VPU/memory
bound with terrible locality.

This module replaces it with the TPU-native formulation: voxels are
grouped into spatial blocks, each block collects its candidate samples
(every sample whose influence ball |x-p| < 3*scale touches the block's
AABB) ON THE HOST with vectorized numpy hashing, and the device then
runs ONE regular fused kernel per shape bucket:

    (B, V, S) dense:  d = vox[b,v] - samp[b,s]
                      mask = |d|^2 < 9 scale^2  (exact influence test)
                      scale filter per (b,v) via bisection for the
                        count//10-th smallest in-radius scale
                        (iso_octree.cc:104-112 semantics)
                      basis/weight/gradient evaluation (basis.py math)
                      sum over s  ->  (B, V, 10)

No sorts, no gathers, no scatters on device; everything is elementwise
plus clean S-axis reductions that XLA fuses into a single pass. The
dense candidate set is ~4-6x the exact pair count, but each element
costs ~100 fused flops with perfect regularity — orders of magnitude
faster than the scatter/sort path end to end. The sample table is
shipped to the device once; per-dispatch traffic is int32 index tables,
and all dispatches are queued before a single sync.

Reference semantics preserved (libs/fssr/iso_octree.cc sample_ifn +
basis_function.h): influence radius 3*scale, per-voxel scale filter
keeping samples with scale <= 2 x the 10th-percentile influencing
scale, and the VoxelData accumulators {value, conf, deriv, scale,
color}.

Streaming (fssr/streaming.py) reuses the same machinery with sample
CHUNKS: a first device pass accumulates per-voxel log-scale histograms
(one-hot MXU contraction), per-voxel thresholds come from the
histogram's count//10 quantile, and a second pass evaluates each chunk
against fixed thresholds — the accumulators are plain sums, so chunk
results add.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_VB = 64            # voxels per eval-block (dense padding unit)
_SB_MIN = 256       # smallest candidate-sample bucket
_ELEMS_PER_DISPATCH = 1 << 24  # bound (B, V, S) intermediate size
HIST_BINS = 64      # per-voxel scale-histogram resolution (streaming)


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def _pair_terms(vox_pos, samp, sidx, s_mask):
    """Shared per-pair geometry: gather sample rows on device and compute
    distances / influence mask. Returns a dict of (B,V,S)-shaped terms
    plus the gathered sample fields."""
    rows = samp[sidx]                    # (B,S,13) device gather
    s_pos = rows[..., 0:3]
    s_norm = rows[..., 3:6]
    s_scale = jnp.maximum(rows[..., 6], 1e-12)
    s_conf = rows[..., 7]
    s_color = rows[..., 8:11]
    d = vox_pos[:, :, None, :] - s_pos[:, None, :, :]       # (B,V,S,3)
    dist2 = jnp.sum(d * d, axis=-1)                          # (B,V,S)
    s = s_scale[:, None, :]
    s2 = s * s
    q = dist2 / s2
    in_rad = (q < 9.0) & s_mask[:, None, :]
    return dict(d=d, dist2=dist2, s=s, s2=s2, q=q, in_rad=in_rad,
                s_norm=s_norm, s_scale=s_scale, s_conf=s_conf,
                s_color=s_color)


def _accumulate(t, keep, vox_mask):
    """Basis/weight/derivative accumulators over kept pairs
    (basis.evaluate_pairs math; basis_function.h:23-71). Returns
    (B, V, 10) sums [vw, w, cw, sw, dvw(3), c(3)]."""
    d, dist2, s, s2, q = t["d"], t["dist2"], t["s"], t["s2"], t["q"]
    s_norm, s_conf, s_color = t["s_norm"], t["s_conf"], t["s_color"]

    x = jnp.sum(d * s_norm[:, None, :, :], axis=-1)          # (B,V,S)
    g = jnp.exp(-dist2 / (2.0 * s2))
    value_norm = 2.0 * jnp.pi * s2 * s2
    f = x * g / value_norm
    sq = jnp.sqrt(jnp.maximum(q, 0.0))
    w = 1.0 - (2.0 / 3.0) * q + (8.0 / 27.0) * q * sq - (1.0 / 27.0) * q * q

    conf = jnp.where(keep, s_conf[:, None, :], 0.0)
    vw = jnp.sum(f * w * conf, axis=-1)
    wc = jnp.sum(w * conf, axis=-1)

    # grad f = g/(norm s^2) ((s^2 - x^2) n - x (d - x n)); grad w =
    # w'(q) 2 d / s^2 with w' = -2/3 + 4/9 sqrt(q) - 2/27 q.
    d_perp = d - x[..., None] * s_norm[:, None, :, :]
    grad_f = (g / (value_norm * s2))[..., None] * (
        (s2 - x * x)[..., None] * s_norm[:, None, :, :]
        - x[..., None] * d_perp)
    wprime = -2.0 / 3.0 + (4.0 / 9.0) * sq - (2.0 / 27.0) * q
    grad_w = (2.0 * wprime / s2)[..., None] * d
    dvw = jnp.sum((grad_f * w[..., None] + grad_w * f[..., None])
                  * conf[..., None], axis=-2)                # (B,V,3)

    # Color/scale accumulators: normalized gaussian at sigma = scale/5
    # (iso_octree.cc:152-158).
    sigma_c = s / 5.0
    cw_pair = jnp.exp(-dist2 / (2.0 * sigma_c * sigma_c)) / (
        sigma_c * jnp.sqrt(2.0 * jnp.pi))
    cw_pair = jnp.where(keep, cw_pair * t["s_conf"][:, None, :], 0.0)
    cw = jnp.sum(cw_pair, axis=-1)
    sw = jnp.sum(cw_pair * s, axis=-1)
    c = jnp.sum(cw_pair[..., None] * s_color[:, None, :, :], axis=-2)

    out = jnp.concatenate([
        vw[..., None], wc[..., None], cw[..., None], sw[..., None],
        dvw, c], axis=-1)                                     # (B,V,10)
    return jnp.where(vox_mask[..., None], out, 0.0)


@jax.jit
def _eval_dense(vox_pos, vox_mask, samp, sidx, s_mask):
    """All-in-one evaluation: in-radius test, on-device bisection for the
    per-voxel scale-filter threshold, accumulators. Used when the whole
    sample set is resident (non-streaming path)."""
    t = _pair_terms(vox_pos, samp, sidx, s_mask)
    in_rad, s = t["in_rad"], t["s"]

    cnt = jnp.sum(in_rad, axis=-1)                           # (B,V)
    k = cnt // 10
    smax = jnp.max(jnp.where(s_mask, t["s_scale"], 0.0), axis=-1)  # (B,)
    lo = jnp.zeros(cnt.shape, jnp.float32)
    hi = jnp.broadcast_to(smax[:, None], cnt.shape).astype(jnp.float32)

    def _bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        c = jnp.sum(in_rad & (s <= mid[..., None]), axis=-1)
        ge = c >= k + 1
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 25, _bisect, (lo, hi))
    keep = in_rad & (s <= (2.0 * hi)[..., None])
    return _accumulate(t, keep, vox_mask)


@jax.jit
def _eval_dense_thresh(vox_pos, vox_mask, samp, sidx, s_mask, thresh):
    """Evaluation against PRE-COMPUTED per-voxel scale thresholds
    (streaming passes: thresholds come from the histogram pass)."""
    t = _pair_terms(vox_pos, samp, sidx, s_mask)
    keep = t["in_rad"] & (t["s"] <= thresh[..., None])
    return _accumulate(t, keep, vox_mask)


@jax.jit
def _hist_dense(vox_pos, vox_mask, samp, sidx, s_mask, log_lo, inv_width):
    """Per-voxel log-scale histograms of in-radius samples: one-hot bin
    assignment contracted over the sample axis (an MXU matmul).
    Returns (B, V, HIST_BINS) float32 counts."""
    t = _pair_terms(vox_pos, samp, sidx, s_mask)
    bins = jnp.clip(jnp.floor(
        (jnp.log(t["s_scale"]) - log_lo) * inv_width), 0, HIST_BINS - 1)
    oh = jax.nn.one_hot(bins.astype(jnp.int32), HIST_BINS,
                        dtype=jnp.float32, axis=-1)           # (B,S,NB)
    counts = jnp.einsum("bvs,bsn->bvn", t["in_rad"].astype(jnp.float32),
                        oh, preferred_element_type=jnp.float32)
    return jnp.where(vox_mask[..., None], counts, 0.0)


# ---------------------------------------------------------------------------
# host-side plan
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class BlockPartition:
    """Spatial partition of the evaluation positions, computed once and
    reused for every sample chunk."""
    origin: np.ndarray
    block_w: float
    bdims: np.ndarray
    order: np.ndarray       # position indices sorted by block code
    ublocks: np.ndarray     # sorted unique block codes
    bstart: np.ndarray
    bcount: np.ndarray
    eb_block: np.ndarray    # eval-row -> ublock index
    eb_vstart: np.ndarray
    eb_vcount: np.ndarray
    pos32: np.ndarray       # (V, 3) float32 positions (original order)


def partition_positions(positions: np.ndarray,
                        block_w: float) -> BlockPartition:
    positions = np.asarray(positions, np.float64)
    origin = positions.min(axis=0) - block_w
    pb = np.floor((positions - origin) / block_w).astype(np.int64)
    bdims = pb.max(axis=0) + 2
    bcode = (pb[:, 2] * bdims[1] + pb[:, 1]) * bdims[0] + pb[:, 0]
    order = np.argsort(bcode, kind="stable")
    ublocks, bstart = np.unique(bcode[order], return_index=True)
    bcount = np.diff(np.append(bstart, len(order)))
    # Split each block's voxel list into eval-rows of <= _VB voxels.
    nch = (bcount + _VB - 1) // _VB
    eb_block = np.repeat(np.arange(len(ublocks)), nch)
    within = np.arange(len(eb_block)) - np.repeat(np.cumsum(nch) - nch, nch)
    return BlockPartition(
        origin=origin, block_w=block_w, bdims=bdims, order=order,
        ublocks=ublocks, bstart=bstart, bcount=bcount, eb_block=eb_block,
        eb_vstart=bstart[eb_block] + within * _VB,
        eb_vcount=np.minimum(bcount[eb_block] - within * _VB, _VB),
        pos32=positions.astype(np.float32))


def _expand_sample_blocks(pos, scale, origin, block_w, bdims):
    """(sample, block-code) entries for every block whose AABB is within
    each sample's influence radius 3*scale. Vectorized range expansion
    with an exact point-to-AABB distance test."""
    r = 3.0 * scale
    lo = np.floor((pos - r[:, None] - origin) / block_w).astype(np.int64)
    hi = np.floor((pos + r[:, None] - origin) / block_w).astype(np.int64)
    lo = np.clip(lo, 0, bdims - 1)
    hi = np.clip(hi, 0, bdims - 1)
    span = (hi - lo).max(axis=1)
    ent_s, ent_b = [], []
    for m in np.unique(span):
        sel = np.nonzero(span == m)[0]
        slo, shi = lo[sel], hi[sel]
        for dz in range(m + 1):
            for dy in range(m + 1):
                for dx in range(m + 1):
                    c = slo + np.array([dx, dy, dz], np.int64)
                    ok = (c <= shi).all(axis=1)
                    if not ok.any():
                        continue
                    cc = c[ok]
                    ss = sel[ok]
                    # Exact distance from sample to block AABB.
                    bmin = origin + cc * block_w
                    dd = np.maximum(bmin - pos[ss], 0.0) \
                        + np.maximum(pos[ss] - (bmin + block_w), 0.0)
                    near = np.sum(dd * dd, axis=1) < r[ss] * r[ss]
                    code = (cc[near, 2] * bdims[1] + cc[near, 1]) \
                        * bdims[0] + cc[near, 0]
                    ent_s.append(ss[near])
                    ent_b.append(code)
    if not ent_s:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(ent_s), np.concatenate(ent_b)


def _sample_table(samples) -> np.ndarray:
    """Pack sample fields into the padded (Nb, 13) device table."""
    n = len(samples.pos)
    Nb = 1 << max(8, int(np.ceil(np.log2(max(n, 1)))))
    table = np.zeros((Nb, 13), np.float32)
    table[:n, 0:3] = samples.pos
    table[:n, 3:6] = samples.normal
    table[:n, 6] = samples.scale
    table[:n, 7] = samples.confidence
    table[:n, 8:11] = samples.color
    return table


def run_chunk(part: BlockPartition, samples, out: np.ndarray,
              mode: str = "bisect", thresh: np.ndarray | None = None,
              hist_log_lo: float = 0.0, hist_inv_width: float = 1.0,
              mesh=None):
    """Evaluate one sample chunk against the partitioned positions and
    ADD the per-position results into `out`.

    mode: 'bisect' (self-contained scale filter; out is (V, 10)),
    'thresh' (fixed per-position thresholds; out is (V, 10)), or
    'hist' (accumulate scale histograms; out is (V, HIST_BINS)).

    mesh: optional jax.sharding.Mesh — eval-rows are independent, so the
    dispatch batch axis shards across devices with no collectives (SURVEY
    §2.9 "shard everything independent"; the OpenMP-over-voxels analog of
    iso_octree.cc:73)."""
    pos = samples.pos.astype(np.float64)
    scale = samples.scale.astype(np.float64)
    if len(pos) == 0 or len(part.order) == 0:
        return

    ent_s, ent_b = _expand_sample_blocks(
        pos, scale, part.origin, part.block_w, part.bdims)
    j = np.searchsorted(part.ublocks, ent_b)
    j = np.clip(j, 0, len(part.ublocks) - 1)
    okb = part.ublocks[j] == ent_b
    ent_s, ent_blk = ent_s[okb], j[okb]
    eorder = np.argsort(ent_blk, kind="stable")
    ent_s = ent_s[eorder]
    scount = np.bincount(ent_blk[eorder], minlength=len(part.ublocks))
    sstart = np.concatenate([[0], np.cumsum(scount)[:-1]])
    eb_scount = scount[part.eb_block]

    sb = np.maximum(_SB_MIN, 1 << np.ceil(
        np.log2(np.maximum(eb_scount, 1))).astype(np.int64))
    # Rows with no candidate samples contribute exactly zero; skip them
    # (on octave-grouped scale-diverse runs most rows are empty for most
    # groups).
    sb = np.where(eb_scount > 0, sb, -1)
    d_table = jnp.asarray(_sample_table(samples))
    if mesh is not None:
        from ..parallel.mesh import replicate

        d_table = replicate(mesh, d_table)

    pending = []  # (device result, vidx, vmask, n_valid)
    for SB in np.unique(sb):
        if SB < 0:
            continue
        rows = np.nonzero(sb == SB)[0]
        SBi = int(SB)
        # ONE dispatch shape (B, _VB, SB) per SB bucket: compile count is
        # bounded by the handful of pow2 SB values, not by run sizes.
        B = max(1, _ELEMS_PER_DISPATCH // (_VB * SBi))
        if mesh is not None:
            B = (B + mesh.size - 1) // mesh.size * mesh.size
        for c0 in range(0, len(rows), B):
            sel = rows[c0:c0 + B]
            npad = B - len(sel)
            vs = part.eb_vstart[sel]
            vc = part.eb_vcount[sel]
            ar = np.arange(_VB)
            vidx = part.order[np.minimum(vs[:, None] + ar[None, :],
                                         len(part.order) - 1)]
            vmask = ar[None, :] < vc[:, None]
            ss = sstart[part.eb_block[sel]]
            sc = eb_scount[sel]
            ar_s = np.arange(SBi)
            sidx = ent_s[np.minimum(ss[:, None] + ar_s[None, :],
                                    max(len(ent_s) - 1, 0))]
            smask = ar_s[None, :] < sc[:, None]
            if npad:
                zpadv = np.zeros((npad, _VB), np.int64)
                vidx = np.concatenate([vidx, zpadv])
                vmask = np.concatenate([vmask, zpadv.astype(bool)])
                zpads = np.zeros((npad, SBi), np.int64)
                sidx = np.concatenate([sidx, zpads])
                smask = np.concatenate([smask, zpads.astype(bool)])
            args = (jnp.asarray(part.pos32[vidx]), jnp.asarray(vmask),
                    d_table, jnp.asarray(sidx.astype(np.int32)),
                    jnp.asarray(smask))
            if mesh is not None:
                # Shard the batch axis of everything but the (replicated)
                # sample table; each device evaluates its rows locally.
                from ..parallel.mesh import shard_batch

                args = (shard_batch(mesh, args[0]), shard_batch(mesh, args[1]),
                        d_table, shard_batch(mesh, args[3]),
                        shard_batch(mesh, args[4]))
            if mode == "bisect":
                res = _eval_dense(*args)
            elif mode == "thresh":
                res = _eval_dense_thresh(
                    *args, jnp.asarray(thresh[vidx].astype(np.float32)))
            elif mode == "hist":
                res = _hist_dense(*args, jnp.asarray(hist_log_lo),
                                  jnp.asarray(hist_inv_width))
            else:
                raise ValueError(f"unknown mode {mode!r}")
            pending.append((res, vidx, vmask, len(sel)))
    # One sync at the end: device compute overlaps the host-side table
    # assembly of subsequent dispatches.
    for res, vidx, vmask, n in pending:
        arr = np.asarray(res, np.float64)
        m = vmask[:n]
        out[vidx[:n][m]] += arr[:n][m]


def _sample_subset(samples, mask):
    from .sample import SampleList

    return SampleList(
        pos=samples.pos[mask], normal=samples.normal[mask],
        color=samples.color[mask], scale=samples.scale[mask],
        confidence=samples.confidence[mask])


def evaluate_positions_blocked(samples, positions: np.ndarray,
                               block_cells: float = 4.0,
                               mesh=None) -> np.ndarray:
    """Compute the per-voxel FSSR accumulator sums (V, 10) for arbitrary
    positions with the dense block kernel. Drop-in replacement for the
    pair-list + segment-sum path in iso_octree.evaluate_at_positions.
    With `mesh`, dispatch batches shard across its devices (pure data
    parallelism over independent eval-rows).

    Scale-DIVERSE sample sets (max/min scale > 8) evaluate per scale
    octave, each octave against a partition sized to ITS influence
    radius: one median-derived block size makes a coarse sample touch
    O((scale/median)^3) blocks — a 100x scale span turned the r04 block
    expansion into minutes of host work. The per-voxel scale filter
    couples octaves, so the diverse path uses the streaming two-pass
    form (per-voxel log-scale histograms -> fixed thresholds -> additive
    evaluation), exact to one histogram bin like fssr/streaming.py."""
    positions = np.asarray(positions, np.float64)
    V = len(positions)
    sums = np.zeros((V, 10), np.float64)
    if V == 0 or len(samples.pos) == 0:
        return sums
    scale = samples.scale.astype(np.float64)
    smin = max(float(scale.min()), 1e-12)
    smax = float(scale.max())
    # The octave-grouped two-pass runs the block expansion and kernel
    # sweep once per (group, pass) — worth it only for genuinely
    # scale-diverse inputs where a single median-sized partition makes
    # coarse samples touch O((smax/median)^3) blocks. Ordinary psets
    # (span < ~30) stay on the one-pass bisect path: the 100-view bench
    # pset (span 8.2) paid 6 sweeps over 1.45M samples for nothing.
    if smax / smin <= 32.0:
        h = float(np.median(scale))
        part = partition_positions(positions, block_cells * max(h, 1e-12))
        run_chunk(part, samples, sums, mode="bisect", mesh=mesh)
        return sums

    # --- octave groups (3 octaves per group keeps group count small
    # while bounding per-sample touched blocks at ~(6/4*8+2)^3).
    oct_id = np.floor(np.log2(scale / smin) / 3.0).astype(np.int64)
    groups = []
    for g in np.unique(oct_id):
        m = oct_id == g
        sub = _sample_subset(samples, m)
        gmax = float(scale[m].max())
        part = partition_positions(positions, block_cells * gmax)
        groups.append((sub, part))

    # Pass 1: per-voxel log-scale histograms over all groups.
    log_lo = np.log(smin)
    log_hi = np.log(max(smax, smin * (1 + 1e-9))) + 1e-9
    inv_width = HIST_BINS / max(log_hi - log_lo, 1e-9)
    hists = np.zeros((V, HIST_BINS), np.float64)
    for sub, part in groups:
        run_chunk(part, sub, hists, mode="hist", hist_log_lo=log_lo,
                  hist_inv_width=inv_width, mesh=mesh)
    counts = hists.sum(axis=1)
    k = (counts // 10).astype(np.int64)
    cum = np.cumsum(hists, axis=1)
    bin_idx = np.argmax(cum >= (k + 1)[:, None], axis=1)
    edges = np.exp(log_lo + np.arange(HIST_BINS + 1) / inv_width)
    thresh = np.where(counts > 0, 2.0 * edges[bin_idx + 1], 0.0)

    # Pass 2: additive evaluation against the fixed thresholds.
    for sub, part in groups:
        run_chunk(part, sub, sums, mode="thresh", thresh=thresh, mesh=mesh)
    return sums
