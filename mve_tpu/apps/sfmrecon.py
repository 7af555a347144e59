"""sfmrecon: incremental SfM on a scene (reference: apps/sfmrecon/sfmrecon.cc).

Pipeline: features -> pairwise matching (cached in prebundle.sfm) ->
intrinsics from EXIF/views -> tracks -> initial pair -> incremental SfM
with bundle adjustment -> synth_0.out + undistorted embeddings.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..core import Scene
from ..core import image_tools
from ..utils.timer import WallTimer
from ..sfm.bundler import (
    Features, FeaturesOptions, Matching, BundlerMatchingOptions,
    Intrinsics, IntrinsicsOptions, Viewport,
    save_prebundle, load_prebundle)
from ..sfm.bundler.intrinsics import IntrinsicsSource
from ..sfm.bundler.pipeline import run_incremental_sfm, SfmOptions
from ..sfm.bundler.common import normalize_feature_positions


RAND_SEED_MATCHING = 0
RAND_SEED_SFM = 1


def sfm_reconstruct(scene_path: str, *, max_pixels: int = 6_000_000,
                    initial_pair=(-1, -1), video_matching: int = 0,
                    use_lowres_matching: bool = False,
                    use_cascade_hashing: bool = False,
                    fixed_intrinsics: bool = False,
                    intrinsics_from_views: bool = False,
                    always_full_ba: bool = False,
                    normalize: bool = False,
                    track_error_thres_factor: float = 10.0,
                    new_track_error_thres: float = 0.01,
                    min_views_per_track: int = 3,
                    undistorted_name: str = "undistorted",
                    original_name: str = "original",
                    verbose: bool = True) -> None:
    scene = Scene(scene_path)
    views = scene.get_views()
    if len(views) < 2:
        raise RuntimeError("Scene has too few views")

    prebundle_path = os.path.join(scene_path, "prebundle.sfm")
    timer = WallTimer()

    if os.path.isfile(prebundle_path):
        if verbose:
            print("Loading prebundle...")
        viewports, pairwise_matching = load_prebundle(prebundle_path)
        # Descriptor-free viewports; matching is already done.
    else:
        viewports = [Viewport() for _ in views]
        if verbose:
            print("Computing image features...")
        features = Features(FeaturesOptions(max_image_size=max_pixels, verbose=verbose))
        imgs, idxs = [], []
        for i, view in enumerate(views):
            if view is None:
                continue
            name = original_name if view.has_image(original_name) else undistorted_name
            img = view.get_image(name)
            if img is None:
                continue
            imgs.append(img)
            idxs.append(i)
        features.compute_batched(imgs, [viewports[i] for i in idxs])
        for i in idxs:
            views[i].cache_cleanup()
        if verbose:
            print(f"Computed features in {timer.get_elapsed()}ms.")

        timer.reset()
        if verbose:
            print("Performing feature matching...")
        mopts = BundlerMatchingOptions(
            use_lowres_matching=use_lowres_matching,
            use_cascade_hashing=use_cascade_hashing,
            max_num_pairs_per_view=video_matching,
            verbose=verbose)
        if use_cascade_hashing:
            # Matcher selection (sfmrecon.cc:141-153): the LSH cascade
            # runs per pair; the default path batches all pairs into a
            # few MXU dispatches.
            matcher = Matching(mopts)
        else:
            from ..sfm.bundler.matching_batched import BatchedMatching

            matcher = BatchedMatching(mopts)
        pairwise_matching = matcher.compute(viewports, seed=RAND_SEED_MATCHING)
        if verbose:
            print(f"Matching took {timer.get_elapsed()}ms; "
                  f"{len(pairwise_matching)} connected pairs.")
        save_prebundle(viewports, pairwise_matching, prebundle_path)

    if not pairwise_matching:
        raise RuntimeError("No matching image pairs")

    # Intrinsics priors.
    intr = Intrinsics(IntrinsicsOptions(
        intrinsics_source=(IntrinsicsSource.FROM_VIEWS if intrinsics_from_views
                           else IntrinsicsSource.FROM_EXIF)))
    intr.compute(scene, viewports)

    timer.reset()
    opts = SfmOptions(
        initial_pair=initial_pair,
        min_views_per_track=min_views_per_track,
        always_full_ba=always_full_ba,
        normalize_scene=normalize,
        verbose=verbose)
    opts.incremental_opts.track_error_threshold_factor = track_error_thres_factor
    opts.incremental_opts.new_track_error_threshold = new_track_error_thres
    opts.incremental_opts.ba_fixed_intrinsics = fixed_intrinsics
    opts.incremental_opts.verbose_output = verbose
    incremental = run_incremental_sfm(viewports, pairwise_matching, opts)
    if verbose:
        print(f"SfM reconstruction took {timer.get_elapsed()}ms.")

    # Save bundle + apply cameras + undistort (sfmrecon.cc:400-444).
    bundle = incremental.create_bundle()
    scene.set_bundle(bundle)
    scene.save_bundle()
    for i, view in enumerate(views):
        if view is None:
            continue
        cam = bundle.cameras[i]
        if view.camera.flen == 0.0 and cam.flen == 0.0:
            continue
        view.set_camera(cam)
        if undistorted_name and cam.flen > 0:
            original = view.get_byte_image(original_name)
            if original is not None:
                undist = image_tools.image_undistort_k2k4(
                    image_tools.to_float(original), float(cam.flen),
                    float(cam.dist[0]), float(cam.dist[1]))
                view.set_image(undistorted_name, image_tools.to_byte(np.asarray(undist)))
        view.save_view()
        view.cache_cleanup()
    if verbose:
        n_valid = sum(1 for c in bundle.cameras if c.flen > 0)
        print(f"SfM done: {n_valid}/{len(views)} cameras, "
              f"{bundle.get_num_features()} tracks.")
    return incremental


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sfmrecon",
                                description="Incremental structure-from-motion.")
    p.add_argument("scene", help="Scene directory")
    p.add_argument("--max-pixels", type=int, default=6_000_000,
                   help="Limit image size for feature detection")
    p.add_argument("--initial-pair", type=str, default="-1,-1",
                   help="Initial pair view IDs, e.g. 0,5")
    p.add_argument("--video-matching", type=int, default=0,
                   help="Only match to ARG previous frames")
    p.add_argument("--lowres-matching", action="store_true",
                   help="Low-res match pre-filtering")
    p.add_argument("--cascade-hashing", action="store_true",
                   help="Use cascade hashing for matching")
    p.add_argument("--fixed-intrinsics", action="store_true",
                   help="Do not optimize camera intrinsics")
    p.add_argument("--intrinsics-from-views", action="store_true",
                   help="Use intrinsics from the views (meta.ini)")
    p.add_argument("--always-full-ba", action="store_true",
                   help="Run full bundle adjustment after every view")
    p.add_argument("--normalize", action="store_true",
                   help="Normalize scene after reconstruction")
    p.add_argument("--track-error-thres", type=float, default=10.0)
    p.add_argument("--new-track-error-thres", type=float, default=0.01)
    p.add_argument("--min-views-per-track", type=int, default=3)
    args = p.parse_args(argv)
    pair = tuple(int(x) for x in args.initial_pair.split(","))
    sfm_reconstruct(
        args.scene, max_pixels=args.max_pixels, initial_pair=pair,
        video_matching=args.video_matching,
        use_lowres_matching=args.lowres_matching,
        use_cascade_hashing=args.cascade_hashing,
        fixed_intrinsics=args.fixed_intrinsics,
        intrinsics_from_views=args.intrinsics_from_views,
        always_full_ba=args.always_full_ba, normalize=args.normalize,
        track_error_thres_factor=args.track_error_thres,
        new_track_error_thres=args.new_track_error_thres,
        min_views_per_track=args.min_views_per_track)
    return 0


if __name__ == "__main__":
    sys.exit(main())
