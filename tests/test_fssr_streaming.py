"""Streaming FSSR: chunked evaluation must reproduce the in-memory path
and hold peak memory flat as the point set grows (the reference streams
samples straight into octree insertion, sample_io.cc:471)."""

import os

import numpy as np

from mve_tpu.core import mesh_io
from mve_tpu.core.mesh import TriangleMesh
from mve_tpu.fssr.sample import SampleList
from mve_tpu.fssr.streaming import compute_voxels_streaming
from mve_tpu.fssr.iso_octree import IsoOctree
from mve_tpu.fssr.iso_surface import IsoSurface

from tests.test_fssr import _sphere_samples


def _chunked(samples, n_chunks):
    def gen():
        edges = np.linspace(0, len(samples), n_chunks + 1).astype(int)
        for a, b in zip(edges[:-1], edges[1:]):
            yield SampleList(pos=samples.pos[a:b],
                             normal=samples.normal[a:b],
                             color=samples.color[a:b],
                             scale=samples.scale[a:b],
                             confidence=samples.confidence[a:b])
    return gen


def test_streaming_matches_in_memory():
    # Fixed cell size: the streaming median is histogram-approximate
    # (~1% relative), which would shift the grid; with the cell pinned
    # the two paths must agree voxel-for-voxel.
    samples = _sphere_samples(n=2500)
    grid_mem = IsoOctree(cell_size=0.12).compute_voxels(samples)
    grid_str = compute_voxels_streaming(_chunked(samples, 5),
                                        cell_size=0.12)
    assert np.array_equal(grid_mem.voxel_codes, grid_str.voxel_codes)
    # Uniform scales: the histogram scale filter keeps everything, so
    # the fields agree to float addition-order noise.
    vmax = np.abs(grid_mem.value).max()
    assert np.abs(grid_mem.value - grid_str.value).max() < 1e-3 * vmax
    cmax = grid_mem.conf.max()
    assert np.abs(grid_mem.conf - grid_str.conf).max() < 1e-3 * cmax
    mesh = IsoSurface(grid_str).extract_mesh()
    radii = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(np.median(radii) - 1.0) < 0.05


def test_streaming_chunk_count_invariance():
    """The accumulators are sums: 2 chunks and 7 chunks must agree."""
    samples = _sphere_samples(n=1500, seed=3)
    g2 = compute_voxels_streaming(_chunked(samples, 2))
    g7 = compute_voxels_streaming(_chunked(samples, 7))
    assert np.array_equal(g2.voxel_codes, g7.voxel_codes)
    vmax = np.abs(g2.value).max()
    assert np.abs(g2.value - g7.value).max() < 1e-3 * vmax


def test_streaming_scale_filter_multiscale():
    """The histogram threshold reproduces the reference's per-voxel
    scale filter on mixed-scale input: near the fine sphere the coarse
    samples are dropped (same contract as test_fssr_scale_adaptivity)."""
    from mve_tpu.fssr.sample import merge_samples

    fine = _sphere_samples(n=1500, scale=0.1, seed=1)
    coarse = _sphere_samples(n=100, radius=1.15, scale=0.8, seed=2)
    both = merge_samples([fine, coarse])
    grid = compute_voxels_streaming(_chunked(both, 4))
    from mve_tpu.fssr.iso_octree import voxel_positions

    pos = voxel_positions(grid.voxel_codes, grid.origin, grid.cell_size,
                          grid.dims)
    r = np.linalg.norm(pos, axis=1)
    near_fine = (r > 0.9) & (r < 1.05) & (grid.conf > 0)
    assert near_fine.any()
    assert np.median(grid.scale[near_fine]) < 0.3


def test_fssrecon_stream_cli_and_memory(tmp_path):
    """End-to-end --stream on a PLY pset: output matches the in-memory
    run, and the streaming path's extra RSS stays bounded by the chunk
    size (not the file size) when the pset doubles."""
    import resource

    from mve_tpu.apps.fssrecon import fssr_reconstruct

    def write_pset(path, n):
        s = _sphere_samples(n=n, seed=9)
        mesh = TriangleMesh()
        mesh.vertices = s.pos
        mesh.vertex_normals = s.normal
        mesh.vertex_values = s.scale
        mesh.vertex_confidences = s.confidence
        mesh_io.save_mesh(mesh, path)

    p1 = str(tmp_path / "pset1.ply")
    write_pset(p1, 4000)
    # adaptive=False: the streaming path is the memory-bounded variant
    # of the UNIFORM grid, so parity is checked against that.
    m_mem = fssr_reconstruct(p1, verbose=False, adaptive=False)
    m_str = fssr_reconstruct(p1, verbose=False, stream=True,
                             stream_chunk_size=512)
    # Same surface (up to float noise in the accumulators).
    assert abs(m_str.num_vertices() - m_mem.num_vertices()) \
        <= 0.02 * m_mem.num_vertices()

    # Memory flatness: doubling the pset with chunked streaming must not
    # double the high-water mark. ru_maxrss is monotone per process, so
    # measure the INCREMENT each run adds on top of the current peak.
    def rss_delta(fn):
        before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        fn()
        return resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss - before

    p2 = str(tmp_path / "pset2.ply")
    write_pset(p2, 8000)
    d_small = rss_delta(lambda: fssr_reconstruct(
        p1, verbose=False, stream=True, stream_chunk_size=512))
    d_big = rss_delta(lambda: fssr_reconstruct(
        p2, verbose=False, stream=True, stream_chunk_size=512))
    # The big run may allocate more voxels, but must not scale with the
    # sample count (in-memory would add ~2x the small run's sample
    # footprint again).
    assert d_big <= max(d_small * 1.5, 64 * 1024), (d_small, d_big)
