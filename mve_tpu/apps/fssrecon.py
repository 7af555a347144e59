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

#: Sub-stage timings/counters of the most recent fssr_reconstruct call
#: (ms unless suffixed): load, voxel_set, eval, extract, n_samples,
#: n_voxels, n_faces. The round-3 FSSR regression went unnoticed for a
#: round because the bench recorded only the stage total.
LAST_STATS: dict = {}


#: Streaming engages automatically above this total input sample count
#: (memory-bounded pipeline; the reference ALWAYS streams its input,
#: sample_io.cc next_sample — here the in-memory path is faster for
#: everything that fits, so the switch is by size).
AUTO_STREAM_SAMPLES = 8_000_000


def fssr_reconstruct(input_paths, output_path: str | None = None, *,
                     scale_factor: float = 1.0, use_hermite: bool | None = None,
                     interpolation: str = "cubic",
                     cell_size: float | None = None,
                     adaptive: bool | None = None,
                     refine_octree: int = 0,
                     min_scale: float = 0.0, max_scale: float = 0.0,
                     max_level: int = 10, verbose: bool = True,
                     stream: bool | None = None,
                     stream_chunk_size: int = 1 << 20):
    """adaptive=None -> scale-adaptive octree extraction (the default,
    like the reference's octree-level-adaptive iso-surface); pass
    adaptive=False for the uniform grid at ~median sample scale.
    stream=None -> auto-engage the memory-bounded streaming path above
    AUTO_STREAM_SAMPLES input samples (uniform-grid, constant memory)."""
    import numpy as _np

    if isinstance(input_paths, str):
        input_paths = [input_paths]
    if stream is None:
        from ..fssr.sample import ply_vertex_count

        try:
            total = sum(ply_vertex_count(p) for p in input_paths)
        except (IOError, OSError):
            total = 0
        stream = total > AUTO_STREAM_SAMPLES
        if stream and verbose:
            print(f"Streaming {total} samples (> {AUTO_STREAM_SAMPLES}).")
    if adaptive is None:
        adaptive = not stream
    if stream:
        if adaptive:
            raise ValueError("--stream and --adaptive are exclusive")
        return _fssr_reconstruct_streaming(
            input_paths, output_path, scale_factor=scale_factor,
            use_hermite=use_hermite, interpolation=interpolation,
            cell_size=cell_size, refine_octree=refine_octree,
            min_scale=min_scale, max_scale=max_scale,
            chunk_size=stream_chunk_size, verbose=verbose)

    LAST_STATS.clear()
    t_load = WallTimer()
    sample_lists = []
    for path in input_paths:
        s = load_samples_from_ply(path, scale_factor)
        if verbose:
            print(f"Loaded {len(s)} samples from {path}.")
        sample_lists.append(s)
    samples = merge_samples(sample_lists)
    LAST_STATS["load_ms"] = t_load.get_elapsed()
    LAST_STATS["n_samples"] = len(samples)
    # Scale clamping/filtering (fssrecon.cc min-scale/max-scale: smaller
    # samples are clamped up, larger samples are ignored).
    if max_scale > 0.0:
        keep = samples.scale <= max_scale
        if not keep.all():
            if verbose:
                print(f"Ignoring {int((~keep).sum())} samples above "
                      f"max scale {max_scale}.")
            from ..fssr.sample import SampleList

            samples = SampleList(
                pos=samples.pos[keep], normal=samples.normal[keep],
                color=samples.color[keep], scale=samples.scale[keep],
                confidence=samples.confidence[keep])
    if min_scale > 0.0:
        samples.scale = _np.maximum(samples.scale, min_scale)
    if len(samples) == 0:
        raise RuntimeError("No valid samples loaded")
    if refine_octree > 0:
        # Subdivide the implicit-function sampling N extra levels
        # (fssrecon.cc -r / octree.refine_octree): the uniform grid's
        # equivalent is halving the cell size N times.
        if cell_size is None:
            scale = samples.scale.astype(_np.float64)
            cell_size = float(_np.median(scale))
        cell_size = cell_size / (2.0 ** refine_octree)
        max_level = max_level + refine_octree

    timer = WallTimer()
    if adaptive:
        # Scale-adaptive octree dual contouring (crack-free across
        # levels; resolution follows sample scale like the reference's
        # octree-level-adaptive extraction, iso_surface.cc:445-528).
        from ..fssr.dual_contouring import DualContouring

        dc = DualContouring(samples, max_level=max_level,
                            interpolation=interpolation)
        LAST_STATS["octree_ms"] = timer.get_elapsed()
        if verbose:
            print(f"Octree with {len(dc.octree.leaf_level)} leaves, "
                  f"took {timer.get_elapsed()}ms.")
        timer.reset()
        mesh = dc.extract_mesh()
        LAST_STATS["eval_ms"] = dc.stats.get("eval_ms", 0)
        LAST_STATS["n_voxels"] = dc.stats.get("n_corners", 0)
        if verbose:
            print(f"Sampled implicit function at "
                  f"{LAST_STATS['n_voxels']} octree corners, "
                  f"took {LAST_STATS['eval_ms']}ms.")
    else:
        grid = IsoOctree(cell_size=cell_size).compute_voxels(samples)
        LAST_STATS["eval_ms"] = timer.get_elapsed()
        LAST_STATS["n_voxels"] = int(len(grid.voxel_codes))
        if verbose:
            print(f"Sampled implicit function at {len(grid.voxel_codes)} voxels, "
                  f"took {timer.get_elapsed()}ms.")
        timer.reset()
        mesh = IsoSurface(grid, use_hermite=use_hermite,
                          interpolation=interpolation).extract_mesh()
    if adaptive:
        LAST_STATS["extract_ms"] = dc.stats.get("extract_ms", 0)
    else:
        LAST_STATS["extract_ms"] = timer.get_elapsed()
    LAST_STATS["n_faces"] = int(mesh.num_faces())
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


def _fssr_reconstruct_streaming(input_paths, output_path, *, scale_factor,
                                use_hermite, interpolation, cell_size,
                                refine_octree, min_scale, max_scale,
                                chunk_size, verbose):
    """Memory-bounded reconstruction: the point set is streamed in
    chunks through fssr/streaming.py and never materialized (the
    reference's next_sample pipeline, sample_io.cc:471)."""
    import numpy as _np

    from ..fssr.sample import SampleList, stream_samples_from_ply
    from ..fssr.streaming import compute_voxels_streaming

    if isinstance(input_paths, str):
        input_paths = [input_paths]
    LAST_STATS.clear()

    def chunks():
        for path in input_paths:
            for ch in stream_samples_from_ply(path, scale_factor,
                                              chunk_size=chunk_size):
                if max_scale > 0.0:
                    keep = ch.scale <= max_scale
                    if not keep.all():
                        ch = SampleList(
                            pos=ch.pos[keep], normal=ch.normal[keep],
                            color=ch.color[keep], scale=ch.scale[keep],
                            confidence=ch.confidence[keep])
                if min_scale > 0.0:
                    ch.scale = _np.maximum(ch.scale, min_scale)
                yield ch

    eff_cell = cell_size
    if refine_octree > 0 and eff_cell is not None:
        eff_cell = eff_cell / (2.0 ** refine_octree)
    timer = WallTimer()
    grid = compute_voxels_streaming(chunks, cell_size=eff_cell,
                                    verbose=verbose)
    if refine_octree > 0 and cell_size is None:
        # Median-derived cell: redo at the refined resolution (the
        # stream told us the median only after the first pass).
        grid = compute_voxels_streaming(
            chunks, cell_size=grid.cell_size / (2.0 ** refine_octree),
            verbose=verbose)
    LAST_STATS["eval_ms"] = timer.get_elapsed()
    LAST_STATS["n_voxels"] = int(len(grid.voxel_codes))
    timer.reset()
    mesh = IsoSurface(grid, use_hermite=use_hermite,
                      interpolation=interpolation).extract_mesh()
    LAST_STATS["extract_ms"] = timer.get_elapsed()
    LAST_STATS["n_faces"] = int(mesh.num_faces())
    if verbose:
        print(f"Extracted {mesh.num_faces()} faces (streaming).")
    if mesh.has_vertex_confidences():
        mesh.delete_vertices_fix_faces(mesh.vertex_confidences <= 0.0)
    if output_path:
        mesh_io.save_mesh(mesh, output_path)
        if verbose:
            print(f"Wrote surface with {mesh.num_vertices()} vertices "
                  f"to {output_path}.")
    return mesh


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fssrecon",
                                description="Floating-scale surface reconstruction.")
    p.add_argument("inputs", nargs="+", help="Input PLY point set(s)")
    p.add_argument("output", help="Output PLY mesh")
    p.add_argument("-s", "--scale-factor", type=float, default=1.0,
                   help="Multiply sample scales with ARG")
    p.add_argument("-r", "--refine-octree", type=int, default=0,
                   help="Refines octree with N levels [0]")
    p.add_argument("--min-scale", type=float, default=0.0,
                   help="Minimum scale, smaller samples are clamped")
    p.add_argument("--max-scale", type=float, default=0.0,
                   help="Maximum scale, larger samples are ignored")
    p.add_argument("--interpolation", default="cubic",
                   choices=("linear", "scaling", "lsderiv", "cubic"),
                   help="Iso-vertex interpolation [cubic]")
    p.add_argument("--hermite", action="store_true",
                   help="(deprecated) same as --interpolation cubic")
    p.add_argument("--cell-size", type=float, default=None,
                   help="Override voxel grid cell size")
    p.add_argument("--adaptive", action="store_true",
                   help="(deprecated) scale-adaptive extraction is the default")
    p.add_argument("--uniform-grid", action="store_true",
                   help="Uniform voxel grid at ~median sample scale instead "
                        "of scale-adaptive octree extraction")
    p.add_argument("--max-level", type=int, default=10,
                   help="Maximum octree level for adaptive extraction")
    p.add_argument("--stream", action="store_true",
                   help="Memory-bounded chunked streaming of the input "
                        "point set (auto-engaged above "
                        f"{AUTO_STREAM_SAMPLES} samples)")
    p.add_argument("--stream-chunk-size", type=int, default=1 << 20,
                   help="Samples per streaming chunk [1M]")
    args = p.parse_args(argv)
    stream = True if args.stream else None
    adaptive = False if (args.uniform_grid or args.stream) else (
        True if args.adaptive else None)
    fssr_reconstruct(args.inputs, args.output, scale_factor=args.scale_factor,
                     interpolation=args.interpolation,
                     refine_octree=args.refine_octree,
                     min_scale=args.min_scale, max_scale=args.max_scale,
                     cell_size=args.cell_size,
                     adaptive=adaptive, max_level=args.max_level,
                     stream=stream,
                     stream_chunk_size=args.stream_chunk_size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
