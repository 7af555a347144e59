"""FSSR tests: implicit function + surface extraction on analytic shapes."""

import numpy as np

from mve_tpu.fssr import IsoOctree, IsoSurface, clean_mc_mesh
from mve_tpu.fssr.sample import SampleList, samples_from_mesh
from mve_tpu.core.mesh import TriangleMesh


def _sphere_samples(n=2000, radius=1.0, scale=0.12, seed=0, noise=0.0):
    rng = np.random.RandomState(seed)
    dirs = rng.randn(n, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pos = dirs * (radius + rng.randn(n, 1) * noise)
    return SampleList(
        pos=pos.astype(np.float32),
        normal=dirs.astype(np.float32),
        color=np.full((n, 3), 0.6, np.float32),
        scale=np.full(n, scale, np.float32),
        confidence=np.ones(n, np.float32),
    )


def test_fssr_sphere():
    samples = _sphere_samples()
    grid = IsoOctree().compute_voxels(samples)
    assert (grid.conf > 0).any()
    mesh = IsoSurface(grid).extract_mesh()
    assert mesh.num_vertices() > 200
    assert mesh.num_faces() > 200
    radii = np.linalg.norm(mesh.vertices, axis=1)
    # Surface should be close to the unit sphere.
    assert abs(np.median(radii) - 1.0) < 0.05
    assert radii.std() < 0.05
    # Confidences positive, colors sane.
    assert mesh.vertex_confidences.min() > 0
    assert np.all(mesh.vertex_colors[:, :3] > 0.3)
    # Normals should point outward (positive side of the implicit fn).
    mesh.recalc_normals()
    outward = np.sum(mesh.vertex_normals * mesh.vertices, axis=1)
    assert (outward > 0).mean() > 0.95


def test_fssr_scale_adaptivity():
    """Coarse samples should not wash out fine geometry: the per-voxel
    scale filter keeps the finest 10th percentile x2."""
    fine = _sphere_samples(n=1500, scale=0.1, seed=1)
    coarse = _sphere_samples(n=100, radius=1.15, scale=0.8, seed=2)
    from mve_tpu.fssr.sample import merge_samples

    both = merge_samples([fine, coarse])
    grid = IsoOctree().compute_voxels(both)
    # Near the fine surface the per-voxel scale filter must have dropped
    # the coarse (0.8-scale) samples: interpolated voxel scale stays fine.
    pos = grid.voxel_position(grid.voxel_codes)
    r = np.linalg.norm(pos, axis=1)
    near_fine = (r > 0.9) & (r < 1.05) & (grid.conf > 0)
    assert near_fine.any()
    assert np.median(grid.scale[near_fine]) < 0.3
    # A surface component still hugs the fine sphere at radius 1.
    mesh = IsoSurface(grid).extract_mesh()
    radii = np.linalg.norm(mesh.vertices, axis=1)
    n_fine = int(((radii > 0.94) & (radii < 1.06)).sum())
    assert n_fine > 1000, f"only {n_fine} surface vertices near r=1"


def test_fssr_hermite():
    samples = _sphere_samples()
    grid = IsoOctree().compute_voxels(samples)
    mesh = IsoSurface(grid, use_hermite=True).extract_mesh()
    radii = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(np.median(radii) - 1.0) < 0.05


def test_mesh_clean():
    # Build a mesh with a needle: nearly-degenerate sliver triangle.
    mesh = TriangleMesh()
    mesh.vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, 1, 0], [0.501, 1.0001, 0.0]], np.float32)
    mesh.faces = np.array([[0, 1, 2], [1, 3, 2], [0, 2, 3]], np.int32)
    n = clean_mc_mesh(mesh)
    assert n >= 1
    # The needle edge 2-3 collapsed.
    assert mesh.num_vertices() <= 3


def test_samples_from_mesh_cleaning():
    mesh = TriangleMesh()
    mesh.vertices = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    mesh.vertex_normals = np.array([[0, 0, 1], [0, 0, 0], [0, 0, 1]], np.float32)
    mesh.vertex_values = np.array([0.1, 0.1, -0.5], np.float32)  # scale
    mesh.vertex_confidences = np.array([1.0, 1.0, 1.0], np.float32)
    s = samples_from_mesh(mesh)
    # Zero normal and negative scale dropped.
    assert len(s) == 1
    np.testing.assert_allclose(s.pos[0], [0, 0, 0])


def test_block_eval_scale_diverse_octave_groups():
    """Scale-diverse sample sets (100x span) evaluate via octave-grouped
    two-pass block evaluation; result must match the single-partition
    bisect path up to the documented histogram-bin quantization of
    the scale-filter threshold (streaming.py pass C semantics)."""
    import numpy as np

    from mve_tpu.fssr.block_eval import (evaluate_positions_blocked,
                                         partition_positions, run_chunk)
    from mve_tpu.fssr.sample import SampleList, merge_samples

    rng = np.random.RandomState(3)

    def patch(x0, x1, y0, y1, scale, n):
        pos = np.stack([rng.uniform(x0, x1, n), rng.uniform(y0, y1, n),
                        rng.randn(n) * scale * 0.01], 1)
        nrm = np.tile(np.array([0, 0, 1], np.float32), (n, 1))
        return SampleList(pos=pos.astype(np.float32), normal=nrm,
                          color=np.full((n, 3), 0.5, np.float32),
                          scale=np.full(n, scale, np.float32),
                          confidence=np.ones(n, np.float32))

    s = merge_samples([patch(0, 1, 0, 1, 0.1, 60),
                       patch(0.2, 0.25, 0.2, 0.25, 0.001, 300)])
    q = np.stack([rng.uniform(0, 1, 500), rng.uniform(0, 1, 500),
                  rng.uniform(-0.05, 0.05, 500)], 1)
    diverse = evaluate_positions_blocked(s, q)
    ref = np.zeros((len(q), 10))
    run_chunk(partition_positions(q, 4.0 * 0.1), s, ref, mode="bisect")
    assert np.abs(ref).sum() > 0
    np.testing.assert_allclose(diverse, ref, rtol=1e-4, atol=1e-4)
