"""meshalign: merge range-scan alignments into one mesh
(reference: apps/meshalign/meshalign.cc, stanford_alignment.h).

Supports Stanford .conf alignment files:
    camera T1 T2 T3 Q1 Q2 Q3 Q4
    bmesh FILE_NAME T1 T2 T3 Q1 Q2 Q3 Q4
Each bmesh entry is a scan transformed by translation T and quaternion Q
(x, y, z, w order as in the Stanford repositories). Plain mesh arguments
are merged untransformed.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..core import mesh_io
from ..core.mesh_tools import mesh_merge, mesh_transform
from ..math.rotation import quat_to_matrix


def read_stanford_alignment(conf_path: str):
    """Returns a list of (mesh_path, 4x4 transform)."""
    base = os.path.dirname(conf_path)
    entries = []
    with open(conf_path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "bmesh":
                name = parts[1]
                t = np.array([float(x) for x in parts[2:5]])
                qx, qy, qz, qw = (float(x) for x in parts[5:9])
                R = np.asarray(quat_to_matrix(np.array([qw, qx, qy, qz])), np.float64)
                M = np.eye(4)
                M[:3, :3] = R
                M[:3, 3] = t
                entries.append((os.path.join(base, name), M))
    return entries


def mesh_align(inputs, output_path: str | None = None, verbose: bool = True):
    meshes = []
    for path in inputs:
        if path.endswith(".conf"):
            for mesh_path, M in read_stanford_alignment(path):
                if not os.path.isfile(mesh_path):
                    # Stanford archives often gzip scans; try .ply fallback.
                    alt = os.path.splitext(mesh_path)[0] + ".ply"
                    if os.path.isfile(alt):
                        mesh_path = alt
                    else:
                        if verbose:
                            print(f"Missing scan {mesh_path}, skipping.")
                        continue
                mesh = mesh_io.load_mesh(mesh_path)
                mesh_transform(mesh, M)
                meshes.append(mesh)
                if verbose:
                    print(f"{mesh_path}: {mesh.num_vertices()} vertices.")
        else:
            meshes.append(mesh_io.load_mesh(path))
    merged = mesh_merge(meshes)
    if output_path:
        mesh_io.save_mesh(merged, output_path)
        if verbose:
            print(f"Wrote {merged.num_vertices()} vertices to {output_path}.")
    return merged


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="meshalign",
                                description="Merge aligned range scans into one mesh.")
    p.add_argument("inputs", nargs="+", help="Meshes and/or .conf alignments")
    p.add_argument("output", help="Output mesh")
    args = p.parse_args(argv)
    mesh_align(args.inputs, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
