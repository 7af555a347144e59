"""fssrecon: point sets -> iso-surface mesh (reference: apps/fssrecon/fssrecon.cc).

Loads one or more FSSR-ready PLY point sets (normals + scale in "value" +
confidence), evaluates the implicit function and extracts the surface,
then deletes zero-confidence vertices (fssrecon.cc:100-130).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..core import mesh_io
from ..fssr import IsoOctree, IsoSurface
from ..fssr.sample import load_samples_from_ply, merge_samples
from ..utils.timer import WallTimer


def fssr_reconstruct(input_paths, output_path: str | None = None, *,
                     scale_factor: float = 1.0, use_hermite: bool = False,
                     cell_size: float | None = None, adaptive: bool = False,
                     max_level: int = 10, verbose: bool = True):
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    sample_lists = []
    for path in input_paths:
        s = load_samples_from_ply(path, scale_factor)
        if verbose:
            print(f"Loaded {len(s)} samples from {path}.")
        sample_lists.append(s)
    samples = merge_samples(sample_lists)
    if len(samples) == 0:
        raise RuntimeError("No valid samples loaded")

    timer = WallTimer()
    if adaptive:
        # Scale-adaptive octree dual contouring (crack-free across
        # levels; resolution follows sample scale like the reference's
        # adaptive MC).
        from ..fssr.dual_contouring import DualContouring

        dc = DualContouring(samples, max_level=max_level)
        if verbose:
            print(f"Octree with {len(dc.octree.leaf_level)} leaves, "
                  f"took {timer.get_elapsed()}ms.")
        timer.reset()
        mesh = dc.extract_mesh()
    else:
        grid = IsoOctree(cell_size=cell_size).compute_voxels(samples)
        if verbose:
            print(f"Sampled implicit function at {len(grid.voxel_codes)} voxels, "
                  f"took {timer.get_elapsed()}ms.")
        timer.reset()
        mesh = IsoSurface(grid, use_hermite=use_hermite).extract_mesh()
    if verbose:
        print(f"Extracted {mesh.num_faces()} faces, took {timer.get_elapsed()}ms.")

    # Delete zero-confidence vertices (fssrecon.cc:100-130).
    if mesh.has_vertex_confidences():
        mesh.delete_vertices_fix_faces(mesh.vertex_confidences <= 0.0)

    if output_path:
        mesh_io.save_mesh(mesh, output_path)
        if verbose:
            print(f"Wrote surface with {mesh.num_vertices()} vertices to {output_path}.")
    return mesh


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fssrecon",
                                description="Floating-scale surface reconstruction.")
    p.add_argument("inputs", nargs="+", help="Input PLY point set(s)")
    p.add_argument("output", help="Output PLY mesh")
    p.add_argument("-s", "--scale-factor", type=float, default=1.0,
                   help="Multiply sample scales with ARG")
    p.add_argument("--hermite", action="store_true",
                   help="Hermite iso-vertex interpolation")
    p.add_argument("--cell-size", type=float, default=None,
                   help="Override voxel grid cell size")
    p.add_argument("--adaptive", action="store_true",
                   help="Scale-adaptive octree extraction (dual contouring)")
    p.add_argument("--max-level", type=int, default=10,
                   help="Maximum octree level for --adaptive")
    args = p.parse_args(argv)
    fssr_reconstruct(args.inputs, args.output, scale_factor=args.scale_factor,
                     use_hermite=args.hermite, cell_size=args.cell_size,
                     adaptive=args.adaptive, max_level=args.max_level)
    return 0


if __name__ == "__main__":
    sys.exit(main())
