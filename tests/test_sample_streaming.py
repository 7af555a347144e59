"""Streaming PLY sample input (fssr/sample.stream_samples_from_ply).

The reference reads FSSR point sets sample-by-sample so psets larger
than RAM work (libs/fssr/sample_io.cc:471 next_sample); here the
streaming unit is a bounded chunk. These tests pin: chunked output ==
whole-file output, per-chunk boundedness (the memory guarantee), the
cleaning rules applied per chunk, and the ASCII fallback.
"""

import os

import numpy as np

from mve_tpu.core import mesh_io
from mve_tpu.core.mesh import TriangleMesh
from mve_tpu.fssr.sample import (
    load_samples_from_ply, merge_samples, samples_from_mesh,
    stream_samples_from_ply)


def _make_pset(n=5000, seed=0, invalid_frac=0.3):
    """A pset mesh with normals/value/confidence/colors where a fraction
    of samples violate each cleaning rule."""
    rng = np.random.RandomState(seed)
    mesh = TriangleMesh()
    mesh.vertices = rng.randn(n, 3).astype(np.float32)
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    mesh.vertex_normals = normals
    mesh.vertex_values = rng.rand(n).astype(np.float32) + 0.01
    mesh.vertex_confidences = rng.rand(n).astype(np.float32)
    mesh.vertex_colors = np.concatenate(
        [rng.rand(n, 3).astype(np.float32), np.ones((n, 1), np.float32)], 1)
    bad = rng.rand(n) < invalid_frac
    kind = rng.randint(0, 3, n)
    mesh.vertex_normals[bad & (kind == 0)] = 0.0       # zero normal
    mesh.vertex_values[bad & (kind == 1)] = -1.0       # bad scale
    mesh.vertex_confidences[bad & (kind == 2)] = 0.0   # zero confidence
    return mesh


def _write(mesh, path, fmt="binary"):
    mesh_io.save_ply_mesh(mesh, path, fmt=fmt)


def test_streaming_equals_whole_file(tmp_path):
    mesh = _make_pset()
    path = os.path.join(tmp_path, "pset.ply")
    _write(mesh, path)
    whole = samples_from_mesh(mesh_io.load_ply_mesh(path))
    chunks = list(stream_samples_from_ply(path, chunk_size=512))
    # Memory guarantee: no chunk exceeds the requested size (pre-clean).
    assert len(chunks) >= 5000 // 512
    assert all(len(c) <= 512 for c in chunks)
    got = merge_samples(chunks)
    assert len(got) == len(whole)
    np.testing.assert_allclose(got.pos, whole.pos, atol=1e-6)
    np.testing.assert_allclose(got.normal, whole.normal, atol=1e-6)
    np.testing.assert_allclose(got.scale, whole.scale, atol=1e-6)
    np.testing.assert_allclose(got.confidence, whole.confidence, atol=1e-6)
    np.testing.assert_allclose(got.color, whole.color, atol=1.5 / 255.0)


def test_streaming_cleaning_rules(tmp_path):
    mesh = _make_pset(n=2000, seed=3, invalid_frac=0.5)
    path = os.path.join(tmp_path, "pset.ply")
    _write(mesh, path)
    got = load_samples_from_ply(path)
    # Every survivor satisfies all rules.
    assert (got.scale > 0).all()
    assert (got.confidence > 0).all()
    np.testing.assert_allclose(np.linalg.norm(got.normal, axis=1), 1.0,
                               atol=1e-5)
    # And the count matches the rule-based expectation.
    expect = samples_from_mesh(mesh)
    assert len(got) == len(expect)


def test_streaming_scale_factor(tmp_path):
    mesh = _make_pset(n=300, seed=4, invalid_frac=0.0)
    path = os.path.join(tmp_path, "pset.ply")
    _write(mesh, path)
    s1 = load_samples_from_ply(path, scale_factor=1.0)
    s2 = load_samples_from_ply(path, scale_factor=2.5)
    np.testing.assert_allclose(s2.scale, s1.scale * 2.5, rtol=1e-6)


def test_ascii_fallback(tmp_path):
    mesh = _make_pset(n=200, seed=5, invalid_frac=0.2)
    path = os.path.join(tmp_path, "pset_ascii.ply")
    _write(mesh, path, fmt="ascii")
    chunks = list(stream_samples_from_ply(path, chunk_size=64))
    assert len(chunks) == 1  # whole-file fallback
    got = chunks[0]
    expect = samples_from_mesh(mesh_io.load_ply_mesh(path))
    assert len(got) == len(expect)
    np.testing.assert_allclose(got.pos, expect.pos, atol=1e-4)
