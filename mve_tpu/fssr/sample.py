"""FSSR point samples and streaming input (reference: libs/fssr/sample.h,
sample_io.cc).

Samples are struct-of-arrays: pos (N,3), normal (N,3), color (N,3),
scale (N,), confidence (N,). PLY input maps the "value" property to scale
and "confidence" to confidence (sample_io.cc:160-162), with the same
cleaning rules: drop zero/invalid normals, non-positive scales and
(optionally) zero confidences.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core import mesh_io
from ..core.mesh import TriangleMesh


@dataclasses.dataclass
class SampleList:
    pos: np.ndarray        # (N, 3) float32
    normal: np.ndarray     # (N, 3) float32, unit
    color: np.ndarray      # (N, 3) float32
    scale: np.ndarray      # (N,) float32
    confidence: np.ndarray # (N,) float32

    def __len__(self):
        return len(self.pos)


# Backwards-compatible alias mirroring the reference's single-sample type.
Sample = SampleList


def samples_from_mesh(mesh: TriangleMesh, scale_factor: float = 1.0,
                      drop_zero_conf: bool = True) -> SampleList:
    """Convert a point-set mesh (scene2pset output) into samples
    (sample_io.cc:30-80 SampleIO::read semantics)."""
    if not mesh.has_vertex_normals():
        raise ValueError("Vertex normals missing!")
    if not mesh.has_vertex_values():
        raise ValueError("Vertex scale missing!")
    n = mesh.num_vertices()
    conf = (mesh.vertex_confidences if mesh.has_vertex_confidences()
            else np.ones(n, np.float32))
    color = (mesh.vertex_colors[:, :3] if mesh.has_vertex_colors()
             else np.full((n, 3), 0.5, np.float32))
    scale = mesh.vertex_values * scale_factor

    norm_len = np.linalg.norm(mesh.vertex_normals, axis=1)
    keep = np.isfinite(scale) & (scale > 0) & (norm_len > 1e-6)
    keep &= np.isfinite(mesh.vertices).all(axis=1)
    if drop_zero_conf:
        keep &= conf > 0
    normals = mesh.vertex_normals[keep] / np.maximum(norm_len[keep][:, None], 1e-30)
    return SampleList(
        pos=mesh.vertices[keep].astype(np.float32),
        normal=normals.astype(np.float32),
        color=color[keep].astype(np.float32),
        scale=scale[keep].astype(np.float32),
        confidence=conf[keep].astype(np.float32),
    )


def load_samples_from_ply(path: str, scale_factor: float = 1.0) -> SampleList:
    mesh = mesh_io.load_ply_mesh(path)
    return samples_from_mesh(mesh, scale_factor)


def merge_samples(lists) -> SampleList:
    lists = [s for s in lists if len(s)]
    if not lists:
        return SampleList(*(np.zeros((0, 3), np.float32),) * 3,
                          np.zeros(0, np.float32), np.zeros(0, np.float32))
    return SampleList(
        pos=np.concatenate([s.pos for s in lists]),
        normal=np.concatenate([s.normal for s in lists]),
        color=np.concatenate([s.color for s in lists]),
        scale=np.concatenate([s.scale for s in lists]),
        confidence=np.concatenate([s.confidence for s in lists]),
    )
