"""mesh2pset: mesh -> FSSR-ready point set
(reference: apps/mesh2pset/mesh2pset.cc).

Per vertex: normal from the mesh, scale from the average adjacent edge
length x factor, written to the "value" PLY property.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..core import mesh_io


def mesh_to_pset(input_path: str, output_path: str | None = None, *,
                 scale_factor: float = 1.0, no_scale: bool = False):
    mesh = mesh_io.load_mesh(input_path)
    mesh.ensure_normals()
    if not no_scale:
        n = mesh.num_vertices()
        acc = np.zeros(n, np.float64)
        deg = np.zeros(n, np.float64)
        v = mesh.vertices
        f = mesh.faces
        for a, b in ((0, 1), (1, 2), (2, 0)):
            d = np.linalg.norm(v[f[:, a]] - v[f[:, b]], axis=1)
            np.add.at(acc, f[:, a], d)
            np.add.at(acc, f[:, b], d)
            np.add.at(deg, f[:, a], 1)
            np.add.at(deg, f[:, b], 1)
        mesh.vertex_values = ((acc / np.maximum(deg, 1)) * scale_factor).astype(np.float32)
    mesh.faces = np.zeros((0, 3), np.int32)
    if output_path:
        mesh_io.save_mesh(mesh, output_path, write_normals=True,
                          write_values=not no_scale)
    return mesh


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mesh2pset",
                                description="Mesh -> FSSR point set with normals/scale.")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("-s", "--scale-factor", type=float, default=1.0)
    p.add_argument("-n", "--no-scale", action="store_true")
    args = p.parse_args(argv)
    mesh = mesh_to_pset(args.input, args.output,
                        scale_factor=args.scale_factor, no_scale=args.no_scale)
    print(f"Wrote {mesh.num_vertices()} points.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
