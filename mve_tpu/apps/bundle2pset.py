"""bundle2pset: bundle file -> PLY point cloud
(reference: apps/bundle2pset/bundle2pset.cc)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..core import bundle_io, mesh_io
from ..core.mesh import TriangleMesh


def bundle_to_pointset(bundle_path: str, output_path: str | None = None):
    if os.path.isdir(bundle_path):
        bundle_path = os.path.join(bundle_path, "synth_0.out")
    bundle = bundle_io.load_mve_bundle(bundle_path)
    mesh = TriangleMesh()
    mesh.vertices = bundle.feature_positions()
    colors = bundle.feature_colors()
    mesh.vertex_colors = np.concatenate(
        [colors, np.ones((len(colors), 1), np.float32)], axis=1)
    if output_path:
        mesh_io.save_mesh(mesh, output_path)
    return mesh


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bundle2pset",
                                description="Bundle -> PLY point cloud.")
    p.add_argument("bundle", help="Bundle file or scene directory")
    p.add_argument("output", help="Output PLY")
    args = p.parse_args(argv)
    mesh = bundle_to_pointset(args.bundle, args.output)
    print(f"Wrote {mesh.num_vertices()} points.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
