"""Sample octree (reference: libs/fssr/octree.h/.cc).

Samples insert at the level whose node size matches their scale (bigger
scale -> coarser level, octree.cc:153-230); the leaf set is the union of
nodes holding samples plus every cell a sample's surface band can cross
(|x - pos| < band x scale). Built with vectorized numpy over flat
(level, ix, iy, iz) keys instead of pointers.

The leaf set feeds the adaptive dual-contouring extractor
(dual_contouring.py); implicit-function evaluation reuses the batched
pair machinery from iso_octree.py at the leaf corner positions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from .sample import SampleList


@dataclasses.dataclass
class SampleOctree:
    center: np.ndarray          # root center
    root_size: float
    max_level: int
    # Leaves as arrays: level (L,), coords (L, 3) int64 in level units.
    leaf_level: np.ndarray
    leaf_coord: np.ndarray

    def node_size(self, level):
        return self.root_size / (2.0 ** level)

    def leaf_min_corner(self, idx):
        """World min corner of leaves idx."""
        size = self.node_size(self.leaf_level[idx])[..., None]
        origin = self.center - self.root_size / 2.0
        return origin + self.leaf_coord[idx] * size

    def lookup(self) -> Dict[Tuple[int, int, int, int], int]:
        """(level, ix, iy, iz) -> leaf index."""
        return {
            (int(l), int(c[0]), int(c[1]), int(c[2])): i
            for i, (l, c) in enumerate(zip(self.leaf_level, self.leaf_coord))
        }


def build_octree(samples: SampleList, max_level: int = 10,
                 band: float = 1.2) -> SampleOctree:
    """Construct the leaf set.

    Per sample: level = clamp(floor(log2(root/scale))); the sample marks
    every cell at its level overlapped by the cube |x - pos| <= band *
    scale (the region containing its zero crossing). Coarser ancestors
    of marked cells are NOT leaves; overlapping marks at different
    levels keep the finest (finer data wins, as in the reference's
    octree refinement).
    """
    pos = samples.pos.astype(np.float64)
    scale = samples.scale.astype(np.float64)
    aabb_min = (pos - 3.0 * scale[:, None]).min(axis=0)
    aabb_max = (pos + 3.0 * scale[:, None]).max(axis=0)
    center = (aabb_min + aabb_max) / 2.0
    root_size = float((aabb_max - aabb_min).max()) * 1.01

    # Level per sample: smallest level with node size <= scale, i.e.
    # node size in (scale/2, scale] — the reference's descend rule
    # (octree.cc find_node_descend: stop when node_size <= sample.scale).
    with np.errstate(divide="ignore"):
        lvl = np.ceil(np.log2(root_size / np.maximum(scale, 1e-30))).astype(int)
    lvl = np.clip(lvl, 0, max_level)

    origin = center - root_size / 2.0
    cells = {}
    for level in np.unique(lvl):
        sel = lvl == level
        size = root_size / (2.0 ** level)
        n = 1 << level
        lo = np.floor((pos[sel] - band * scale[sel][:, None] - origin) / size).astype(np.int64)
        hi = np.floor((pos[sel] + band * scale[sel][:, None] - origin) / size).astype(np.int64)
        lo = np.clip(lo, 0, n - 1)
        hi = np.clip(hi, 0, n - 1)
        # Expand each sample's cell range (ranges are tiny: band*scale ~ size).
        coords = []
        span = hi - lo
        max_span = span.max(initial=0)
        for dz in range(max_span + 1):
            for dy in range(max_span + 1):
                for dx in range(max_span + 1):
                    c = lo + [dx, dy, dz]
                    ok = (c <= hi).all(axis=1)
                    coords.append(c[ok])
        allc = np.unique(np.concatenate(coords), axis=0)
        cells[int(level)] = allc

    # Tree construction via the split set: every proper ancestor of a
    # required cell splits; existing nodes are the root plus the 8
    # children of each split node; leaves are existing nodes that do not
    # themselves split. This tiles space exactly (no cracks, no overlap),
    # like the reference's pointer octree.
    split = set()
    for level, cs in cells.items():
        anc = cs.copy()
        for coarser in range(level - 1, -1, -1):
            anc = anc // 2
            uniq = np.unique(anc, axis=0)
            new = 0
            for a in uniq:
                key = (coarser, int(a[0]), int(a[1]), int(a[2]))
                if key not in split:
                    split.add(key)
                    new += 1
            if new == 0:
                break  # all higher ancestors already present

    leaf_level_list = []
    leaf_coord_list = []
    if not split:
        leaf_level_list.append(np.zeros(1, np.int32))
        leaf_coord_list.append(np.zeros((1, 3), np.int64))
    else:
        child_offsets = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
             [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int64)
        for (lvl_s, x, y, z) in split:
            children = np.array([x, y, z], np.int64) * 2 + child_offsets
            child_level = lvl_s + 1
            keep = [c for c in children
                    if (child_level, int(c[0]), int(c[1]), int(c[2])) not in split]
            if keep:
                keep = np.array(keep, np.int64)
                leaf_level_list.append(np.full(len(keep), child_level, np.int32))
                leaf_coord_list.append(keep)

    leaf_level = np.concatenate(leaf_level_list)
    leaf_coord = np.concatenate(leaf_coord_list)
    return SampleOctree(center=center, root_size=root_size, max_level=max_level,
                        leaf_level=leaf_level, leaf_coord=leaf_coord)
