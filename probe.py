"""Staged pipeline probe with verbose per-stage progress (debug aid)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench

base = "/tmp/mve_probe"
scene = os.path.join(base, "scene")
os.makedirs(base, exist_ok=True)

stage = sys.argv[1] if len(sys.argv) > 1 else "all"

t0 = time.time()
if stage == "data" or not os.path.isdir(scene):
    # Only rebuild when explicitly asked ('data') or missing: a rebuild
    # rmtree's the scene and discards previous SfM/MVS artifacts.
    bench.build_dataset(scene)
    print(f"[probe] dataset built {time.time()-t0:.1f}s", flush=True)
    if stage not in ("all", "data", "sfm"):
        sys.exit(f"[probe] fresh dataset has no SfM/MVS artifacts yet; "
                 f"run 'probe.py sfm' (and later stages) before "
                 f"'{stage}'.")

if stage in ("all", "sfm"):
    from mve_tpu.apps.sfmrecon import sfm_reconstruct
    t0 = time.time()
    sfm_reconstruct(scene, verbose=True)
    print(f"[probe] sfm {time.time()-t0:.1f}s", flush=True)

if stage in ("mvs", "pset", "fssr") and not os.path.isfile(
        os.path.join(scene, "synth_0.out")):
    sys.exit(f"[probe] scene has no bundle; run 'probe.py sfm' before "
             f"'{stage}'.")

if stage in ("all", "mvs"):
    from mve_tpu.apps.dmrecon import reconstruct_views
    from mve_tpu.mvs import Settings
    t0 = time.time()
    n = reconstruct_views(scene, scale=bench.MVS_SCALE,
                          settings=Settings(num_sweep_planes=24,
                                            num_propagation_iters=6),
                          verbose=True)
    print(f"[probe] mvs {time.time()-t0:.1f}s n={n}", flush=True)

if stage in ("all", "pset", "fssr"):
    from mve_tpu.apps.scene2pset import scene_to_pointset
    from mve_tpu.apps.fssrecon import fssr_reconstruct
    t0 = time.time()
    pset = os.path.join(base, "pset.ply")
    scene_to_pointset(scene, pset, dmname=f"depth-L{bench.MVS_SCALE}",
                      image=f"undist-L{bench.MVS_SCALE}", with_normals=True,
                      with_scale=True, with_conf=True, verbose=True)
    print(f"[probe] pset {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    surf = fssr_reconstruct(pset, os.path.join(base, "surface.ply"),
                            verbose=True)
    print(f"[probe] fssr {time.time()-t0:.1f}s faces={surf.num_faces()}",
          flush=True)
