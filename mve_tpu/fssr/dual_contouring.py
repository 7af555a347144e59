"""Scale-adaptive iso-surface extraction via octree dual contouring.

The reference extracts with octree-adaptive marching cubes and ~900
lines of cross-level edge stitching (iso_surface.cc). Dual contouring
(Ju et al. 2002) provides the same capability — a crack-free surface
whose resolution follows the octree's sample-scale-adaptive leaves —
with a far simpler cross-level story: one vertex per sign-crossing leaf,
one polygon per sign-crossing MINIMAL edge (an edge not subdivided by
any finer leaf), connecting the vertices of the (up to 4) leaves sharing
that edge. Level transitions need no special cases.

Per-vertex confidence/scale/color interpolate from the leaf's corner
voxel data, preserving fssrecon's downstream contracts (zero-conf
deletion, meshclean).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..core.mesh import TriangleMesh
from .iso_octree import evaluate_at_positions
from .octree import SampleOctree, build_octree
from .sample import SampleList

_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int64)

# Cube edges as corner-index pairs, grouped by axis.
_EDGES = {
    0: [(0, 1), (2, 3), (4, 5), (6, 7)],  # x-edges
    1: [(0, 2), (1, 3), (4, 6), (5, 7)],  # y-edges
    2: [(0, 4), (1, 5), (2, 6), (3, 7)],  # z-edges
}


class DualContouring:
    def __init__(self, samples: SampleList, max_level: int = 10):
        self.samples = samples
        self.octree = build_octree(samples, max_level=max_level)

    def extract_mesh(self) -> TriangleMesh:
        octree = self.octree
        L = len(octree.leaf_level)
        if L == 0:
            return TriangleMesh()
        finest = int(octree.leaf_level.max())
        unit = 1 << finest  # corner coords quantized at the finest level

        # --- unique leaf corners in finest units.
        shift = (finest - octree.leaf_level.astype(np.int64))
        base = octree.leaf_coord << shift[:, None]  # (L, 3)
        step = (np.int64(1) << shift)  # leaf size in finest units
        corners = base[:, None, :] + _CORNERS[None] * step[:, None, None]  # (L, 8, 3)
        cflat = corners.reshape(-1, 3)
        code = (cflat[:, 2] * (unit + 1) + cflat[:, 1]) * (unit + 1) + cflat[:, 0]
        uniq_codes, inv = np.unique(code, return_inverse=True)
        corner_idx = inv.reshape(L, 8)  # leaf corner -> voxel row

        # --- evaluate the implicit function at unique corners.
        cz = uniq_codes // ((unit + 1) * (unit + 1))
        rem = uniq_codes % ((unit + 1) * (unit + 1))
        cy = rem // (unit + 1)
        cx = rem % (unit + 1)
        origin = octree.center - octree.root_size / 2.0
        fine_size = octree.root_size / unit
        positions = origin[None, :] + np.stack([cx, cy, cz], axis=-1) * fine_size
        data = evaluate_at_positions(self.samples, positions)
        value = data["value"]
        conf = data["conf"]

        # --- per-leaf vertex: mass point of its sign-crossing edges.
        vals = value[corner_idx]          # (L, 8)
        confs_ok = (conf[corner_idx] > 0)  # (L, 8)
        leaf_ok = confs_ok.all(axis=1)
        inside = vals < 0

        cpos = positions[corner_idx]  # (L, 8, 3)
        acc = np.zeros((L, 3))
        cnt = np.zeros(L)
        for axis, pairs in _EDGES.items():
            for (a, b) in pairs:
                va = vals[:, a]
                vb = vals[:, b]
                cross = (inside[:, a] != inside[:, b]) & leaf_ok
                t = va / np.where(np.abs(va - vb) < 1e-30, 1e-30, va - vb)
                t = np.clip(t, 0.0, 1.0)
                p = cpos[:, a] + (cpos[:, b] - cpos[:, a]) * t[:, None]
                acc += np.where(cross[:, None], p, 0.0)
                cnt += cross
        has_vertex = (cnt > 0) & leaf_ok
        vert_pos = acc / np.maximum(cnt, 1)[:, None]
        leaf_vertex = np.full(L, -1, np.int64)
        leaf_vertex[has_vertex] = np.arange(int(has_vertex.sum()))
        vertices = vert_pos[has_vertex]

        # Vertex attributes: mean of the leaf's corner voxel data.
        def leaf_attr(arr):
            a = arr[corner_idx]  # (L, 8, ...)
            return a.mean(axis=1)[has_vertex]

        v_conf = leaf_attr(conf)
        v_scale = leaf_attr(data["scale"])
        v_color = leaf_attr(data["color"])

        # --- minimal edges: collect all leaf edges keyed by their line;
        # an edge is minimal if no finer leaf edge is a strict sub-segment.
        # Lines: (axis, perpendicular coords); segments: (start, end).
        edge_lines: Dict[Tuple[int, int, int], list] = {}
        for axis, pairs in _EDGES.items():
            for (a, b) in pairs:
                pa = corners[:, a, :]
                pb = corners[:, b, :]
                perp = [ax for ax in range(3) if ax != axis]
                for li in range(L):
                    key = (axis, int(pa[li, perp[0]]), int(pa[li, perp[1]]))
                    edge_lines.setdefault(key, []).append(
                        (int(pa[li, axis]), int(pb[li, axis]), li))

        faces = []
        for (axis, p0, p1), segs in edge_lines.items():
            if len(segs) < 2:
                continue
            # Minimal segments: no other segment is a strict sub-segment.
            # Per-line counts are small; quadratic scan is fine.
            uniq_segs = sorted(set((s0, s1) for s0, s1, _ in segs))
            minimal = []
            for (s0, s1) in uniq_segs:
                strict_sub = any(
                    t0 >= s0 and t1 <= s1 and (t1 - t0) < (s1 - s0)
                    for (t0, t1) in uniq_segs)
                if not strict_sub:
                    minimal.append((s0, s1))
            for (s0, s1) in minimal:
                # Adjacent leaves: those whose edge on this line contains
                # the minimal segment.
                leaves = sorted(set(
                    li for (t0, t1, li) in segs if t0 <= s0 and t1 >= s1))
                if len(leaves) < 3:
                    continue
                # Sign change across the edge endpoints.
                ia = _corner_lookup(uniq_codes, unit, axis, p0, p1, s0)
                ib = _corner_lookup(uniq_codes, unit, axis, p0, p1, s1)
                if ia < 0 or ib < 0:
                    continue
                if conf[ia] <= 0 or conf[ib] <= 0:
                    continue
                if (value[ia] < 0) == (value[ib] < 0):
                    continue
                vids = [int(leaf_vertex[l]) for l in leaves]
                if any(v < 0 for v in vids):
                    continue
                # Order the polygon around the edge axis by leaf center
                # angle, winding by the sign of the crossing.
                centers = vert_pos[leaves]
                perp = [ax for ax in range(3) if ax != axis]
                mid = centers.mean(axis=0)
                ang = np.arctan2(centers[:, perp[1]] - mid[perp[1]],
                                 centers[:, perp[0]] - mid[perp[0]])
                order = np.argsort(ang)
                ring = [vids[i] for i in order]
                # Winding: CCW in the (perp0, perp1) plane corresponds to a
                # rotation about +axis for x/z edges but about -axis for y
                # (perp order (0,2) measures x->z = rotation about -y).
                flip = value[ia] >= 0  # lower end outside -> flip
                if axis == 1:
                    flip = not flip
                if flip:
                    ring = ring[::-1]
                for k in range(1, len(ring) - 1):
                    faces.append((ring[0], ring[k], ring[k + 1]))

        mesh = TriangleMesh()
        mesh.vertices = vertices.astype(np.float32)
        mesh.faces = (np.array(faces, np.int32).reshape(-1, 3)
                      if faces else np.zeros((0, 3), np.int32))
        mesh.vertex_confidences = v_conf.astype(np.float32)
        mesh.vertex_values = v_scale.astype(np.float32)
        mesh.vertex_colors = np.concatenate(
            [np.clip(v_color, 0, 1), np.ones((len(vertices), 1))],
            axis=1).astype(np.float32)
        # Drop degenerate faces from polygon fanning.
        f = mesh.faces
        ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        mesh.faces = f[ok]
        mesh.delete_unreferenced_vertices()
        return mesh


def _corner_lookup(uniq_codes, unit, axis, p0, p1, s):
    """Row of the corner at axis-coordinate s on line (axis, p0, p1)."""
    coord = [0, 0, 0]
    perp = [ax for ax in range(3) if ax != axis]
    coord[axis] = s
    coord[perp[0]] = p0
    coord[perp[1]] = p1
    code = (coord[2] * (unit + 1) + coord[1]) * (unit + 1) + coord[0]
    i = np.searchsorted(uniq_codes, code)
    if i < len(uniq_codes) and uniq_codes[i] == code:
        return int(i)
    return -1
