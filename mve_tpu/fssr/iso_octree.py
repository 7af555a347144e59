"""Implicit-function evaluation on a sparse voxel grid
(reference: libs/fssr/iso_octree.cc, octree.cc influence_query).

Host side builds the voxel set and the voxel/sample influence pairs with
vectorized grid hashing (samples bucketed by scale octave, searchsorted
range lookups — the batched replacement for the reference's pointer
octree influence_query). The device evaluates all pairs in one fused
kernel (basis.evaluate_pairs) and segment-sums per voxel.

Reference semantics preserved: influence radius 3 x sample scale, the
per-voxel scale filter (sort influencing samples by scale, drop samples
with scale > 2 x the 10th-percentile scale, iso_octree.cc:104-112), and
the VoxelData fields {value, conf, deriv, scale, color}.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .basis import evaluate_pairs
from .sample import SampleList


@dataclasses.dataclass
class VoxelGrid:
    origin: np.ndarray      # (3,) world position of voxel (0,0,0)
    cell_size: float
    dims: np.ndarray        # (3,) number of voxels per axis (corners)
    voxel_codes: np.ndarray # (V,) sorted linear codes of evaluated voxels
    value: np.ndarray       # (V,)
    conf: np.ndarray        # (V,)
    deriv: np.ndarray       # (V, 3)
    scale: np.ndarray       # (V,)
    color: np.ndarray       # (V, 3)
    active_cells: np.ndarray  # (C, 3) integer cell coords with all 8 corners

    def voxel_position(self, codes):
        iz = codes // (self.dims[0] * self.dims[1])
        rem = codes % (self.dims[0] * self.dims[1])
        iy = rem // self.dims[0]
        ix = rem % self.dims[0]
        return self.origin[None, :] + np.stack([ix, iy, iz], axis=-1) * self.cell_size


def _shape_bucket(n: int, minimum: int = 4096) -> int:
    """Next power of two >= n. Every jit entry point pads to bucketed
    shapes: the persistent XLA cache is unavailable on this backend, so
    stable in-process shapes are what keeps recompiles O(log size)."""
    size = minimum
    while size < n:
        size *= 2
    return size


def evaluate_at_positions(samples: SampleList, positions: np.ndarray,
                          pair_chunk: int = 0) -> dict:
    """Evaluate the FSSR implicit function at arbitrary positions.

    Returns dict of arrays value/conf/deriv/scale/color, each len(positions).
    This is iso_octree.cc sample_ifn batched: influence pairing by grid
    hashing on the host, then ONE fused device program (scale filter via
    on-device sort + per-voxel percentile, basis/weight evaluation,
    segment sums) over shape-bucketed padded pair arrays.
    """
    del pair_chunk  # retained for API compatibility
    pos = samples.pos.astype(np.float64)
    scale = samples.scale.astype(np.float64)
    positions = np.asarray(positions, np.float64)
    V = len(positions)
    N = len(pos)

    import os
    from ..utils.tracing import trace_stage

    if os.environ.get("MVE_TPU_FSSR_PAIRWISE") != "1":
        # Production path: dense block kernel — no device sorts, gathers
        # or scatter-adds (see block_eval.py).
        from .block_eval import evaluate_positions_blocked

        with trace_stage("fssr.block_eval"):
            sums = evaluate_positions_blocked(samples, positions)
        return _normalize_sums(sums)

    h = float(np.median(scale))

    from .. import native as _native

    with trace_stage("fssr.influence_pairs"):
        native_pairs = _native.fssr_influence_pairs(positions, pos, scale)
        if native_pairs is not None:
            pair_v, pair_s = native_pairs
        else:
            pair_v, pair_s = IsoOctree._influence_pairs(positions, pos, scale, h)

    from .basis import evaluate_pairs_masked, scale_filter_pairs

    CHUNK = 4_194_304  # fixed eval-chunk length: stable shapes, bounded HBM
    Vb = _shape_bucket(V)
    Nb = _shape_bucket(N)
    Pb = _shape_bucket(len(pair_v), minimum=CHUNK)

    d_positions = jnp.asarray(_pad_rows(positions.astype(np.float32), Vb))
    d_pos = jnp.asarray(_pad_rows(pos.astype(np.float32), Nb))
    d_normal = jnp.asarray(_pad_rows(
        samples.normal.astype(np.float32), Nb, fill=(0.0, 0.0, 1.0)))
    d_scale = jnp.asarray(_pad_rows(scale.astype(np.float32), Nb, fill=1.0))
    d_conf = jnp.asarray(_pad_rows(
        samples.confidence.astype(np.float32), Nb))
    d_color = jnp.asarray(_pad_rows(samples.color.astype(np.float32), Nb))
    pv = np.full(Pb, Vb, np.int32)
    pv[:len(pair_v)] = pair_v
    ps = np.zeros(Pb, np.int32)
    ps[:len(pair_s)] = pair_s

    with trace_stage("fssr.device_eval"):
        s_pv, s_ps, keep = scale_filter_pairs(
            d_scale, jnp.asarray(pv), jnp.asarray(ps), num_voxels=Vb)
        sums_dev = None
        for start in range(0, Pb, CHUNK):
            out = evaluate_pairs_masked(
                d_positions, d_pos, d_normal, d_scale, d_conf, d_color,
                jax.lax.dynamic_slice_in_dim(s_pv, start, CHUNK),
                jax.lax.dynamic_slice_in_dim(s_ps, start, CHUNK),
                jax.lax.dynamic_slice_in_dim(keep, start, CHUNK))
            sums_dev = out if sums_dev is None else sums_dev + out
        sums = np.asarray(sums_dev, np.float64)[:V]
    return _normalize_sums(sums)


def _normalize_sums(sums: np.ndarray) -> dict:
    """Accumulator sums (V, 10) -> VoxelData fields.

    F = sum(f w c)/sum(w c); the derivative keeps the dominant quotient
    term (exact at the zero crossing, iso_octree.cc:121-169)."""
    value = sums[:, 0]
    conf = sums[:, 1]
    cw_total = sums[:, 2]
    sw_total = sums[:, 3]
    deriv = sums[:, 4:7]
    col = sums[:, 7:10]
    w_safe = np.where(conf > 0, conf, 1.0)
    cw_safe = np.where(cw_total > 0, cw_total, 1.0)
    return {
        "value": np.where(conf > 0, value / w_safe, 0.0),
        "conf": conf,
        "deriv": deriv / w_safe[:, None],
        "scale": sw_total / cw_safe,
        "color": col / cw_safe[:, None],
    }


def _pad_rows(arr: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    """Pad axis 0 of arr to length n with a constant row."""
    if arr.shape[0] >= n:
        return arr
    pad = np.empty((n - arr.shape[0],) + arr.shape[1:], arr.dtype)
    pad[...] = fill
    return np.concatenate([arr, pad])


def grid_geometry(aabb_min, aabb_max, h: float, max_grid_dim: int):
    """Uniform-grid origin/cell/dims for an influence-dilated AABB.

    h is nominally the median sample scale (the octree level most
    samples insert at, octree.cc:153-230); it grows if the grid would
    exceed max_grid_dim per axis."""
    dims_f = (aabb_max - aabb_min) / h + 2
    if dims_f.max() > max_grid_dim:
        h = float((aabb_max - aabb_min).max() / (max_grid_dim - 2))
        dims_f = (aabb_max - aabb_min) / h + 2
    origin = aabb_min - h
    dims = np.ceil(dims_f).astype(np.int64) + 2
    return origin, h, dims


def mark_active_cells(pos, scale, origin, h, dims) -> np.ndarray:
    """Unique linear codes of near-surface cells: the (2r+1)^3
    neighborhood around each sample's cell, expanded directly in
    linear-code space (one int64 per cell instead of a coordinate
    triple — the expansion is allocation-bound on this host). Center
    cells are clamped so the whole neighborhood stays in bounds; border
    samples thus mark a shifted (never out-of-range) neighborhood.
    Streaming accumulates the union of per-chunk results."""
    cell = np.floor((pos - origin) / h).astype(np.int64)
    r_cells = np.minimum(np.ceil(np.maximum(scale, h) / h).astype(np.int64), 3)
    code_parts = []
    for r in np.unique(r_cells):
        sub = cell[r_cells == r]
        sub = np.clip(sub, r, (dims - 3 - r)[None, :])
        sub_code = (sub[:, 2] * dims[1] + sub[:, 1]) * dims[0] + sub[:, 0]
        rng = np.arange(-r, r + 1)
        ox, oy, oz = np.meshgrid(rng, rng, rng, indexing="ij")
        offs_code = (oz.reshape(-1) * dims[1] + oy.reshape(-1)) * dims[0] \
            + ox.reshape(-1)
        code_parts.append((sub_code[:, None] + offs_code[None, :]).reshape(-1))
    # Unique via linear codes (np.unique(axis=0) sorts a void view —
    # an order of magnitude slower).
    return np.unique(np.concatenate(code_parts))


def voxels_from_cells(uniq_cell_codes, dims):
    """(voxel_codes, cells, voxel_pos-less) from active cell codes:
    voxels are the unique corners of the active cells. Returns
    (voxel_codes, cells (C, 3) int, voxel coords-to-position left to the
    caller via positions helper)."""
    stride_y = dims[0]
    stride_z = dims[0] * dims[1]
    cz = uniq_cell_codes // stride_z
    crem = uniq_cell_codes % stride_z
    cells = np.stack([crem % dims[0], crem // dims[0], cz], axis=1)
    corner_offs_code = np.array(
        [0, 1, stride_y, stride_y + 1,
         stride_z, stride_z + 1, stride_z + stride_y,
         stride_z + stride_y + 1], np.int64)
    corner_codes = (uniq_cell_codes[:, None]
                    + corner_offs_code[None, :]).reshape(-1)
    voxel_codes = np.unique(corner_codes)
    return voxel_codes, cells


def voxel_positions(voxel_codes, origin, h, dims) -> np.ndarray:
    stride_y = dims[0]
    stride_z = dims[0] * dims[1]
    vx = voxel_codes % stride_y
    vy = (voxel_codes % stride_z) // stride_y
    vz = voxel_codes // stride_z
    return origin[None, :] + np.stack([vx, vy, vz], axis=-1) * h


class IsoOctree:
    """Voxel evaluation engine (mirrors fssr::IsoOctree's compute_voxels)."""

    def __init__(self, cell_size: float | None = None,
                 max_grid_dim: int = 1024, pair_chunk: int = 2_000_000):
        self.cell_size = cell_size
        self.max_grid_dim = max_grid_dim
        self.pair_chunk = pair_chunk

    def compute_voxels(self, samples: SampleList) -> VoxelGrid:
        if len(samples) == 0:
            raise ValueError("No samples given")
        from ..utils.tracing import trace_stage
        with trace_stage("fssr.voxel_set"):
            grid_args = self._build_voxel_set(samples)
        data = evaluate_at_positions(samples, grid_args[-1], self.pair_chunk)
        origin, h, dims, voxel_codes, cells, _ = grid_args
        return VoxelGrid(
            origin=origin, cell_size=h, dims=dims, voxel_codes=voxel_codes,
            value=data["value"], conf=data["conf"], deriv=data["deriv"],
            scale=data["scale"], color=data["color"], active_cells=cells,
        )

    def _build_voxel_set(self, samples: SampleList):
        pos = samples.pos.astype(np.float64)
        scale = samples.scale.astype(np.float64)

        # --- grid resolution: the octree level most samples insert at
        # corresponds to a cell of about the median sample scale.
        h = self.cell_size or float(np.median(scale))
        aabb_min = (pos - 3.0 * scale[:, None]).min(axis=0)
        aabb_max = (pos + 3.0 * scale[:, None]).max(axis=0)
        origin, h, dims = grid_geometry(aabb_min, aabb_max, h,
                                        self.max_grid_dim)
        uniq = mark_active_cells(pos, scale, origin, h, dims)
        voxel_codes, cells = voxels_from_cells(uniq, dims)
        voxel_pos = voxel_positions(voxel_codes, origin, h, dims)
        return origin, h, dims, voxel_codes, cells, voxel_pos

    # ------------------------------------------------------------------
    @staticmethod
    def _influence_pairs(voxel_pos, pos, scale, h):
        """All (voxel, sample) pairs with |v - p| < 3 * scale."""
        pair_v_list, pair_s_list = [], []
        levels = np.clip(np.floor(np.log2(np.maximum(scale / h, 1e-3))).astype(int), -20, 30)
        for lv in np.unique(levels):
            sel = np.nonzero(levels == lv)[0]
            max_r = 3.0 * scale[sel].max()
            cell = max_r  # hash cell equals max influence radius
            s_cell = np.floor(pos[sel] / cell).astype(np.int64)
            v_cell = np.floor(voxel_pos / cell).astype(np.int64)
            # linear codes with offset to avoid negatives
            off = np.minimum(s_cell.min(axis=0), v_cell.min(axis=0)) - 1
            span = np.maximum(s_cell.max(axis=0), v_cell.max(axis=0)) - off + 2
            def code(c):
                c = c - off
                return (c[:, 2] * span[1] + c[:, 1]) * span[0] + c[:, 0]
            s_codes = code(s_cell)
            order = np.argsort(s_codes, kind="stable")
            s_codes_sorted = s_codes[order]
            sel_sorted = sel[order]
            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        q = v_cell + np.array([dx, dy, dz])
                        q_codes = code(q)
                        lo = np.searchsorted(s_codes_sorted, q_codes, "left")
                        hi = np.searchsorted(s_codes_sorted, q_codes, "right")
                        counts = hi - lo
                        nz = np.nonzero(counts)[0]
                        if len(nz) == 0:
                            continue
                        reps = counts[nz]
                        v_ids = np.repeat(nz, reps)
                        starts = lo[nz]
                        # Vectorized range expansion: index k within its
                        # group plus the group's start.
                        total = int(reps.sum())
                        group_start = np.repeat(starts, reps)
                        group_base = np.repeat(np.cumsum(reps) - reps, reps)
                        idx = group_start + (np.arange(total) - group_base)
                        s_ids = sel_sorted[idx]
                        d = voxel_pos[v_ids] - pos[s_ids]
                        ok = np.sum(d * d, axis=1) < (3.0 * scale[s_ids]) ** 2
                        pair_v_list.append(v_ids[ok])
                        pair_s_list.append(s_ids[ok])
        if not pair_v_list:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return np.concatenate(pair_v_list), np.concatenate(pair_s_list)

    # ------------------------------------------------------------------
    @staticmethod
    def _scale_filter(pair_v, pair_s, scale, num_voxels):
        """Drop pairs with sample scale > 2 x the voxel's 10th-percentile
        influencing scale (iso_octree.cc:104-112)."""
        if len(pair_v) == 0:
            return pair_v, pair_s
        pscale = scale[pair_s]
        order = np.lexsort((pscale, pair_v))
        pv = pair_v[order]
        ps = pair_s[order]
        psc = pscale[order]
        # Segment boundaries.
        counts = np.bincount(pv, minlength=num_voxels)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        nth = starts + counts // 10
        nth = np.minimum(nth, starts + np.maximum(counts - 1, 0))
        thresh_per_voxel = np.zeros(num_voxels)
        nonzero = counts > 0
        thresh_per_voxel[nonzero] = psc[nth[nonzero]] * 2.0
        keep = psc <= thresh_per_voxel[pv]
        return pv[keep], ps[keep]
