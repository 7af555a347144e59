"""Marching cubes: table consistency, watertightness, accuracy."""

import numpy as np

from mve_tpu.core.marching_cubes import (MC_EDGE_TABLE, MC_TRI_COUNTS,
                                         MC_TRI_TABLE, marching_cubes,
                                         marching_cubes_accessor)
from mve_tpu.core.volume import Volume, marching_tets


def _edge_use_counts(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


def _sphere_volume(n=24, r=0.35):
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n] / (n - 1.0)
    d = np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2) - r
    return Volume(d.astype(np.float32))


def test_tables_basic():
    assert MC_TRI_COUNTS[0] == 0 and MC_TRI_COUNTS[255] == 0
    assert MC_EDGE_TABLE[0] == 0 and MC_EDGE_TABLE[255] == 0
    # Single-corner configs produce exactly one triangle.
    for i in range(8):
        assert MC_TRI_COUNTS[1 << i] == 1
        assert MC_TRI_COUNTS[255 ^ (1 << i)] == 1
    # Complementary configs cut the same edges.
    for c in range(256):
        assert MC_EDGE_TABLE[c] == MC_EDGE_TABLE[255 ^ c]
    # Every triangle references cut edges only.
    for c in range(256):
        for t in MC_TRI_TABLE[c][: MC_TRI_COUNTS[c]]:
            for e in t:
                assert MC_EDGE_TABLE[c] & (1 << e)


def test_sphere_watertight_and_accurate():
    vol = _sphere_volume()
    mesh = marching_cubes(vol)
    assert mesh.num_faces() > 100
    # Closed surface: every edge shared by exactly two triangles.
    assert np.all(_edge_use_counts(mesh.faces) == 2)
    # All vertices near the sphere.
    r = np.linalg.norm(mesh.vertices - 0.5, axis=1)
    assert np.abs(r - 0.35).max() < 0.01
    # Outward orientation (normals along the SDF gradient).
    v0 = mesh.vertices[mesh.faces[:, 0]]
    v1 = mesh.vertices[mesh.faces[:, 1]]
    v2 = mesh.vertices[mesh.faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    outward = (v0 + v1 + v2) / 3.0 - 0.5
    assert np.all(np.sum(fn * outward, axis=1) > 0)


def test_random_volumes_watertight():
    # Random SDFs exercise a large sample of adjacent case pairs; padding
    # with positive values closes the surface at the boundary.
    rng = np.random.default_rng(11)
    for _ in range(5):
        d = rng.standard_normal((10, 10, 10)).astype(np.float32)
        d = np.pad(d, 1, constant_values=2.0)
        mesh = marching_cubes(Volume(d))
        if mesh.num_faces() == 0:
            continue
        # Closed surface: every edge used an even number of times (count 4
        # = rare non-manifold contact, present in classic MC tables too).
        counts = _edge_use_counts(mesh.faces)
        assert np.all(counts % 2 == 0)
        assert np.mean(counts == 2) > 0.99


def test_matches_marching_tets_topology():
    vol = _sphere_volume(n=16, r=0.3)
    mc = marching_cubes(vol)
    mt = marching_tets(vol)
    # Same surface: equal genus-0 Euler characteristic, similar area.
    for m in (mc, mt):
        v, f = m.num_vertices(), m.num_faces()
        e = 3 * f // 2
        assert v - e + f == 2

    def area(m):
        a = m.vertices[m.faces[:, 0]]
        b = m.vertices[m.faces[:, 1]]
        c = m.vertices[m.faces[:, 2]]
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()

    assert abs(area(mc) - area(mt)) / area(mt) < 0.05
    # MC emits fewer triangles than the tet decomposition.
    assert mc.num_faces() < mt.num_faces()


def test_accessor_variant():
    vol = _sphere_volume(n=12, r=0.3)
    vals = vol.data
    Z, Y, X = vals.shape

    class DenseAccessor:
        def __init__(self):
            self.it = iter(np.ndindex(Z - 1, Y - 1, X - 1))
            self.sdf = np.zeros(8)
            self.vid = np.zeros(8, np.int64)
            self.pos = np.zeros((8, 3))

        def next(self):
            try:
                z, y, x = next(self.it)
            except StopIteration:
                return False
            for i in range(8):
                dx, dy, dz = i & 1, (i >> 1) & 1, (i >> 2) & 1
                self.sdf[i] = vals[z + dz, y + dy, x + dx]
                self.vid[i] = ((z + dz) * Y + (y + dy)) * X + (x + dx)
                self.pos[i] = ((x + dx) / (X - 1.0), (y + dy) / (Y - 1.0),
                               (z + dz) / (Z - 1.0))
            return True

    mesh = marching_cubes_accessor(DenseAccessor())
    dense = marching_cubes(vol)
    assert mesh.num_faces() == dense.num_faces()
    assert np.all(_edge_use_counts(mesh.faces) == 2)
