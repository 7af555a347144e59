"""Scale-adaptive dual-contouring extraction tests."""

from collections import Counter

import numpy as np

from mve_tpu.fssr.dual_contouring import DualContouring
from mve_tpu.fssr.octree import build_octree
from mve_tpu.fssr.sample import SampleList, merge_samples

from tests.test_fssr import _sphere_samples


def _edge_counts(mesh):
    cnt = Counter()
    for f in mesh.faces:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            cnt[tuple(sorted((int(f[a]), int(f[b]))))] += 1
    return np.array(list(cnt.values()))


def test_octree_partition():
    """Leaves tile space: total volume equals the root volume."""
    samples = _sphere_samples(n=500, scale=0.15)
    octree = build_octree(samples, max_level=6)
    sizes = octree.root_size / (2.0 ** octree.leaf_level.astype(np.float64))
    vol = np.sum(sizes**3)
    np.testing.assert_allclose(vol, octree.root_size**3, rtol=1e-9)
    # No duplicate leaves.
    keys = set(zip(octree.leaf_level.tolist(),
                   map(tuple, octree.leaf_coord.tolist())))
    assert len(keys) == len(octree.leaf_level)


def test_dc_sphere_watertight():
    samples = _sphere_samples(n=2000, scale=0.12)
    mesh = DualContouring(samples, max_level=7).extract_mesh()
    assert mesh.num_faces() > 500
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(np.median(r) - 1.0) < 0.02
    assert r.std() < 0.02
    # Watertight: every edge shared by exactly two faces.
    counts = _edge_counts(mesh)
    assert (counts == 2).all()
    # Consistent outward orientation.
    mesh.recalc_normals()
    outward = np.sum(mesh.vertex_normals * mesh.vertices, axis=1)
    assert (outward > 0).mean() > 0.99


def _hemisphere(n, scale, upper, seed):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[:, 2] = np.abs(d[:, 2]) * (1 if upper else -1)
    return SampleList(pos=d.astype(np.float32), normal=d.astype(np.float32),
                      color=np.full((n, 3), 0.5, np.float32),
                      scale=np.full(n, scale, np.float32),
                      confidence=np.ones(n, np.float32))


def test_dc_scale_adaptive():
    """Mixed-scale input: triangle size follows local sample scale."""
    both = merge_samples([
        _hemisphere(4000, 0.05, True, 0),
        _hemisphere(400, 0.3, False, 1),
    ])
    mesh = DualContouring(both, max_level=8).extract_mesh()
    v, f = mesh.vertices, mesh.faces
    ctr = v[f].mean(axis=1)
    area = 0.5 * np.linalg.norm(
        np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]]), axis=1)
    top = np.median(area[ctr[:, 2] > 0.3])
    bottom = np.median(area[ctr[:, 2] < -0.3])
    assert bottom > 10 * top, f"not adaptive: top {top}, bottom {bottom}"
    r = np.linalg.norm(v, axis=1)
    assert abs(np.median(r) - 1.0) < 0.05
    # Crack-freeness ACROSS level transitions: on this mixed-scale input
    # the octree changes resolution around the equator; boundary edges
    # (shared by != 2 faces) would betray cracks exactly there. The
    # surface has open rims only where sample confidence runs out, so
    # demand the interior (both-side-supported equator band) is closed.
    cnt = Counter()
    for f in mesh.faces:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            cnt[tuple(sorted((int(f[a]), int(f[b]))))] += 1
    bad = [e for e, c in cnt.items() if c != 2]
    band = [e for e in bad
            if abs(v[e[0], 2]) < 0.25 and abs(v[e[1], 2]) < 0.25]
    n_band_edges = sum(1 for e in cnt
                       if abs(v[e[0], 2]) < 0.25 and abs(v[e[1], 2]) < 0.25)
    assert len(band) <= 0.01 * max(n_band_edges, 1), (
        f"{len(band)} cracked edges of {n_band_edges} at level transitions")


def test_octree_traversal_semantics():
    """Analog of the reference's octree iterator suite
    (tests/fssr/gtest_octree_iterator.cc): the leaf set tiles the root
    exactly — deterministic, disjoint, gap-free — and every sample's
    insertion level matches its scale (octree.cc:153-230)."""
    import numpy as np

    from mve_tpu.fssr.octree import build_octree
    from mve_tpu.fssr.sample import SampleList

    rng = np.random.RandomState(5)
    n = 200
    pos = rng.rand(n, 3)
    scale = 10.0 ** rng.uniform(-2, -0.5, n)
    samples = SampleList(
        pos=pos, normal=np.tile([0.0, 0.0, 1.0], (n, 1)),
        scale=scale, confidence=np.ones(n), color=np.full((n, 3), 0.5))
    octree = build_octree(samples, max_level=8)

    # 1. Deterministic rebuild.
    octree2 = build_octree(samples, max_level=8)
    k1 = sorted(zip(octree.leaf_level.tolist(),
                    map(tuple, octree.leaf_coord.tolist())))
    k2 = sorted(zip(octree2.leaf_level.tolist(),
                    map(tuple, octree2.leaf_coord.tolist())))
    assert k1 == k2

    # 2. No leaf is an ancestor of another (disjointness).
    leafset = set(zip(octree.leaf_level.tolist(),
                      map(tuple, octree.leaf_coord.tolist())))
    for lvl, c in leafset:
        cc = np.asarray(c)
        for up in range(1, lvl + 1):
            assert (lvl - up, tuple(cc // (2 ** up))) not in leafset

    # 3. Exact tiling: leaf volumes sum to the root volume.
    vol = sum((octree.root_size / 2.0 ** l) ** 3 for l in octree.leaf_level)
    assert abs(vol - octree.root_size ** 3) < 1e-6 * octree.root_size ** 3

    # 4. Sample levels follow scale: node size at the sample's level is
    # >= its scale, and the next-finer level would be smaller.
    lvl = np.floor(np.log2(octree.root_size / scale)).astype(int)
    lvl = np.clip(lvl, 0, 8)
    node = octree.root_size / 2.0 ** lvl
    assert (node >= scale - 1e-12).all()
    assert ((node / 2.0 < scale) | (lvl == 8)).all()
