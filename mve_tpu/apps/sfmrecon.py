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

# Per-run sub-stage timings + quality counters (the reference prints these
# at sfmrecon.cc:100-131; bench.py records them for baseline comparison).
LAST_TIMINGS: dict = {}


def _save_features_part(path: str, idxs, viewports) -> None:
    """Persist one process's freshly-computed viewport features."""
    arrays = {"idxs": np.asarray(idxs, np.int64)}
    for i in idxs:
        vp = viewports[i]
        arrays[f"v{i}_positions"] = vp.positions
        arrays[f"v{i}_colors"] = vp.colors
        arrays[f"v{i}_descriptors"] = vp.descriptors
        arrays[f"v{i}_surf"] = vp.surf_descriptors
        arrays[f"v{i}_meta"] = np.asarray(
            [vp.num_sift, vp.width, vp.height], np.int64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic publish: waiters never see partials


def _load_features_part(path: str, viewports) -> None:
    data = np.load(path)
    for i in data["idxs"]:
        i = int(i)
        vp = viewports[i]
        vp.positions = data[f"v{i}_positions"]
        vp.colors = data[f"v{i}_colors"]
        vp.descriptors = data[f"v{i}_descriptors"]
        vp.surf_descriptors = data[f"v{i}_surf"]
        meta = data[f"v{i}_meta"]
        vp.num_sift, vp.width, vp.height = (int(meta[0]), int(meta[1]),
                                            int(meta[2]))
        vp.track_ids = np.full(len(vp.positions), -1, np.int32)


def _wait_for_files(paths, timeout_s: float = 3600.0) -> None:
    import time

    t0 = time.time()
    while True:
        if all(os.path.isfile(p) for p in paths):
            return
        if time.time() - t0 > timeout_s:
            missing = [p for p in paths if not os.path.isfile(p)]
            raise RuntimeError(f"Timed out waiting for {missing}")
        time.sleep(1.0)


def sfm_reconstruct(scene_path: str, *, max_pixels: int = 6_000_000,
                    initial_pair=(-1, -1), video_matching: int = 0,
                    use_lowres_matching: bool = True,
                    use_cascade_hashing: bool = False,
                    process_id: int = 0, num_processes: int = 1,
                    fixed_intrinsics: bool = False,
                    intrinsics_from_views: bool = False,
                    always_full_ba: bool = False,
                    normalize: bool = False,
                    skip_sfm: bool = False,
                    track_error_thres_factor: float = 10.0,
                    new_track_error_thres: float = 0.01,
                    min_views_per_track: int = 3,
                    undistorted_name: str = "undistorted",
                    original_name: str = "original",
                    exif_name: str = "exif",
                    prebundle_name: str = "prebundle.sfm",
                    survey_file: str = "",
                    log_file: str = "",
                    verbose_ba: bool = False,
                    verbose: bool = True) -> None:
    LAST_TIMINGS.clear()
    scene = Scene(scene_path)
    views = scene.get_views()
    if len(views) < 2:
        raise RuntimeError("Scene has too few views")

    prebundle_path = prebundle_name
    if not os.path.isabs(prebundle_path):
        prebundle_path = os.path.join(scene_path, prebundle_name)
    timer = WallTimer()
    total_timer = WallTimer()

    def log_timing(name, ms):
        if log_file:
            # Append-only timing log (sfmrecon.cc:66-85 log_message).
            import time as _time

            with open(log_file, "a") as f:
                f.write(f"{int(_time.time())} {name} {int(ms)}\n")

    if os.path.isfile(prebundle_path):
        if verbose:
            print("Loading prebundle...")
        viewports, pairwise_matching = load_prebundle(prebundle_path)
        # Descriptor-free viewports; matching is already done.
    else:
        from ..parallel.multihost import my_shard

        viewports = [Viewport() for _ in views]
        if verbose:
            print("Computing image features...")
        features = Features(FeaturesOptions(max_image_size=max_pixels, verbose=verbose))
        imgs, idxs = [], []
        all_idxs = []
        for i, view in enumerate(views):
            if view is None:
                continue
            name = original_name if view.has_image(original_name) else undistorted_name
            if not view.has_image(name):
                continue
            all_idxs.append(i)
        # Views this process detects features for (multi-process: the
        # view list partitions across processes like the reference's
        # OpenMP-dynamic view loop partitions across threads,
        # bundler_features.cc:40).
        mine = (my_shard(all_idxs, process_id, num_processes)
                if num_processes > 1 else all_idxs)
        for i in mine:
            view = views[i]
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
        log_timing("features", timer.get_elapsed())
        LAST_TIMINGS["features_ms"] = timer.get_elapsed()
        LAST_TIMINGS["n_features"] = int(sum(
            len(vp.positions) for vp in viewports if vp.positions is not None))

        if num_processes > 1:
            # Exchange features over shared storage, then shard the pair
            # list; process 0 merges verified matches into prebundle.sfm.
            part = os.path.join(scene_path, f"features.part{process_id}.npz")
            _save_features_part(part, idxs, viewports)
            parts = [os.path.join(scene_path, f"features.part{k}.npz")
                     for k in range(num_processes)]
            _wait_for_files(parts)
            for k, pth in enumerate(parts):
                if k != process_id:
                    _load_features_part(pth, viewports)

        timer.reset()
        if verbose:
            print("Performing feature matching...")
        mopts = BundlerMatchingOptions(
            use_lowres_matching=use_lowres_matching,
            use_cascade_hashing=use_cascade_hashing,
            max_num_pairs_per_view=video_matching,
            verbose=verbose)
        from ..sfm.bundler.matching_batched import BatchedMatching

        if num_processes > 1:
            # Pair list sharded across processes (the distributed analog
            # of OpenMP-dynamic over pairs, bundler_matching.cc:74);
            # verified matches merge into the prebundle on process 0.
            V = len(viewports)
            all_pairs = [(v2, v1) for v1 in range(V) for v2 in range(v1)
                         if not (video_matching > 0 and v1 - v2 > video_matching)]
            my_pairs = my_shard(all_pairs, process_id, num_processes)
            matches = BatchedMatching(mopts).compute(
                viewports, seed=RAND_SEED_MATCHING, pairs=my_pairs)
            mpart = os.path.join(scene_path, f"matches.part{process_id}.npz")
            tmp = mpart + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, n=len(matches),
                         ids=np.asarray([[m.view_1_id, m.view_2_id]
                                         for m in matches], np.int64),
                         **{f"m{j}": m.matches for j, m in enumerate(matches)})
            os.replace(tmp, mpart)
            if process_id != 0:
                if verbose:
                    print(f"Process {process_id}: matching shard done.")
                return None
            mparts = [os.path.join(scene_path, f"matches.part{k}.npz")
                      for k in range(num_processes)]
            _wait_for_files(mparts)
            from ..sfm.bundler.common import TwoViewMatching

            pairwise_matching = []
            for pth in mparts:
                data = np.load(pth)
                ids = data["ids"].reshape(-1, 2)
                for j in range(int(data["n"])):
                    pairwise_matching.append(TwoViewMatching(
                        int(ids[j, 0]), int(ids[j, 1]), data[f"m{j}"]))
            pairwise_matching.sort(key=lambda m: (m.view_1_id, m.view_2_id))
            for pth in mparts + [os.path.join(
                    scene_path, f"features.part{k}.npz")
                    for k in range(num_processes)]:
                try:
                    os.remove(pth)
                except OSError:
                    pass
        elif use_cascade_hashing:
            # Matcher selection (sfmrecon.cc:141-153): the LSH cascade
            # runs per pair; the default path batches all pairs into a
            # few MXU dispatches.
            pairwise_matching = Matching(mopts).compute(
                viewports, seed=RAND_SEED_MATCHING)
        else:
            pairwise_matching = BatchedMatching(mopts).compute(
                viewports, seed=RAND_SEED_MATCHING)
        if verbose:
            print(f"Matching took {timer.get_elapsed()}ms; "
                  f"{len(pairwise_matching)} connected pairs.")
        log_timing("matching", timer.get_elapsed())
        LAST_TIMINGS["matching_ms"] = timer.get_elapsed()
        save_prebundle(viewports, pairwise_matching, prebundle_path)

    if skip_sfm:
        if verbose:
            print("Prebundle computed; skipping SfM (--skip-sfm).")
        return None

    if not pairwise_matching:
        raise RuntimeError("No matching image pairs")

    # Intrinsics priors.
    intr = Intrinsics(IntrinsicsOptions(
        intrinsics_source=(IntrinsicsSource.FROM_VIEWS if intrinsics_from_views
                           else IntrinsicsSource.FROM_EXIF),
        exif_embedding=exif_name))
    intr.compute(scene, viewports)

    survey_points = None
    if survey_file:
        from ..sfm.bundler.common import load_survey

        survey_points = load_survey(survey_file)
        if verbose:
            print(f"Loaded {len(survey_points)} survey points.")

    timer.reset()
    opts = SfmOptions(
        initial_pair=initial_pair,
        min_views_per_track=min_views_per_track,
        always_full_ba=always_full_ba,
        normalize_scene=normalize,
        survey_points=survey_points,
        verbose=verbose)
    opts.incremental_opts.track_error_threshold_factor = track_error_thres_factor
    opts.incremental_opts.new_track_error_threshold = new_track_error_thres
    opts.incremental_opts.ba_fixed_intrinsics = fixed_intrinsics
    opts.incremental_opts.verbose_output = verbose
    opts.incremental_opts.verbose_ba = verbose_ba
    # Multi-chip: shard BA observations over all local devices (psum
    # collectives over ICI). A 1-device mesh is the identity, so this is
    # only engaged when real parallel hardware is present.
    import jax

    if jax.device_count() > 1:
        from ..parallel.mesh import get_mesh

        opts.incremental_opts.ba_mesh = get_mesh()
        if verbose:
            print(f"BA: sharding observations over {jax.device_count()} devices.")
    incremental = run_incremental_sfm(viewports, pairwise_matching, opts)
    if verbose:
        print(f"SfM reconstruction took {timer.get_elapsed()}ms.")
    log_timing("sfm", timer.get_elapsed())
    log_timing("total", total_timer.get_elapsed())
    LAST_TIMINGS["incremental_ms"] = timer.get_elapsed()
    from ..sfm.bundler.pipeline import LAST_PHASE_MS

    LAST_TIMINGS["incremental_phases"] = {
        k: int(v) for k, v in sorted(LAST_PHASE_MS.items())}
    timer.reset()

    # Save bundle + apply cameras + undistort (sfmrecon.cc:400-444).
    bundle = incremental.create_bundle()
    scene.set_bundle(bundle)
    scene.save_bundle()
    # Undistortion runs as ONE batched device program per image shape
    # (sfmrecon.cc:403-444 is an OpenMP loop over views; the batch axis
    # is the TPU-native parallel axis). Views with zero distortion copy
    # the original bytes — the warp is the identity there.
    todo = []  # (view, cam, original) needing the device warp
    groups: dict = {}
    for i, view in enumerate(views):
        if view is None:
            continue
        cam = bundle.cameras[i]
        if view.camera.flen == 0.0 and cam.flen == 0.0:
            continue
        view.set_camera(cam)
        if undistorted_name and cam.flen > 0:
            if float(cam.dist[0]) == 0.0 and float(cam.dist[1]) == 0.0:
                # Identity warp: duplicate the original's file (no
                # decode/re-encode) when possible.
                if not view.copy_image_file(original_name, undistorted_name):
                    original = view.get_byte_image(original_name)
                    if original is not None:
                        view.set_image(undistorted_name, original)
            else:
                original = view.get_byte_image(original_name)
                if original is not None:
                    groups.setdefault(original.shape, []).append(
                        (view, cam, original))
                    continue  # save after the batched warp
        view.save_view()
        view.cache_cleanup()
    for shape, items in groups.items():
        imgs = np.stack([orig for _, _, orig in items])
        flen = np.asarray([float(c.flen) for _, c, _ in items], np.float32)
        k2 = np.asarray([float(c.dist[0]) for _, c, _ in items], np.float32)
        k4 = np.asarray([float(c.dist[1]) for _, c, _ in items], np.float32)
        und = np.asarray(image_tools.image_undistort_k2k4_batch(
            imgs, flen, k2, k4))
        for (view, cam, _), u in zip(items, und):
            view.set_image(undistorted_name, u)
            view.save_view()
            view.cache_cleanup()
    n_valid = sum(1 for c in bundle.cameras if c.flen > 0)
    LAST_TIMINGS["undistort_ms"] = timer.get_elapsed()
    LAST_TIMINGS["n_cameras"] = int(n_valid)
    LAST_TIMINGS["n_tracks"] = int(bundle.get_num_features())
    if verbose:
        print(f"SfM done: {n_valid}/{len(views)} cameras, "
              f"{bundle.get_num_features()} tracks.")
    return incremental


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sfmrecon",
                                description="Incremental structure-from-motion.")
    p.add_argument("scene", help="Scene directory")
    p.add_argument("-o", "--original", default="original",
                   help="Original image embedding [original]")
    p.add_argument("-e", "--exif", default="exif",
                   help="EXIF data embedding [exif]")
    p.add_argument("-m", "--max-pixels", type=int, default=6_000_000,
                   help="Limit image size for feature detection")
    p.add_argument("-u", "--undistorted", default="undistorted",
                   help="Undistorted image embedding [undistorted]")
    p.add_argument("--prebundle", default="prebundle.sfm",
                   help="Load/store pre-bundle file [prebundle.sfm]")
    p.add_argument("--survey", default="",
                   help="Load survey (ground control points) from file []")
    p.add_argument("--log-file", default="",
                   help="Log some timings to file []")
    p.add_argument("--no-prediction", action="store_true",
                   help="Disable low-res matchability prediction")
    p.add_argument("--lowres-matching", action="store_true",
                   help="(deprecated) low-res matching is on by default; "
                        "use --no-prediction to disable")
    p.add_argument("--skip-sfm", action="store_true",
                   help="Compute prebundle, skip SfM reconstruction")
    p.add_argument("--initial-pair", type=str, default="-1,-1",
                   help="Initial pair view IDs, e.g. 0,5")
    p.add_argument("--video-matching", type=int, default=0,
                   help="Only match to ARG previous frames")
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
    p.add_argument("--verbose-ba", action="store_true",
                   help="Print per-iteration BA status")
    # Reference names (sfmrecon.cc:506-507): --track-error-thres is the
    # NEW-track error threshold, --track-thres-factor the median factor.
    p.add_argument("--track-error-thres", type=float, default=0.01,
                   help="Error threshold for new tracks [0.01]")
    p.add_argument("--track-thres-factor", type=float, default=10.0,
                   help="Error threshold factor [10]")
    p.add_argument("--use-2cam-tracks", action="store_true",
                   help="Triangulate tracks from only two cameras")
    p.add_argument("--min-views-per-track", type=int, default=3)
    p.add_argument("--process-id", type=int,
                   default=int(os.environ.get("JAX_PROCESS_ID", 0)),
                   help="This process's index for multi-host feature/"
                        "matching sharding")
    p.add_argument("--num-processes", type=int,
                   default=int(os.environ.get("JAX_NUM_PROCESSES", 1)),
                   help="Total processes sharing features + matching")
    args = p.parse_args(argv)
    pair = tuple(int(x) for x in args.initial_pair.split(","))
    sfm_reconstruct(
        args.scene, max_pixels=args.max_pixels, initial_pair=pair,
        video_matching=args.video_matching,
        use_lowres_matching=not args.no_prediction,
        use_cascade_hashing=args.cascade_hashing,
        process_id=args.process_id, num_processes=args.num_processes,
        fixed_intrinsics=args.fixed_intrinsics,
        intrinsics_from_views=args.intrinsics_from_views,
        always_full_ba=args.always_full_ba, normalize=args.normalize,
        skip_sfm=args.skip_sfm,
        track_error_thres_factor=args.track_thres_factor,
        new_track_error_thres=args.track_error_thres,
        min_views_per_track=2 if args.use_2cam_tracks
        else args.min_views_per_track,
        original_name=args.original, undistorted_name=args.undistorted,
        exif_name=args.exif, prebundle_name=args.prebundle,
        survey_file=args.survey, log_file=args.log_file,
        verbose_ba=args.verbose_ba)
    return 0


if __name__ == "__main__":
    sys.exit(main())
