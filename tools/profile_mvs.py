"""MVS fill-parity iteration on the bench scene (VERDICT r04 item #4).

Builds the exact bench scene once (seed 42), runs SfM once, then
re-runs dmrecon printing per-view fills against the reference's
same-scene fills (memory: mve-tpu-quality-baselines)."""
import os
import shutil
import sys
import time

import numpy as np

SCENE = "/tmp/mvs_scene"
REF_FILLS = [0.892, 0.818, 0.768, 0.780, 0.751, 0.763, 0.756, 0.739,
             0.756, 0.750]

if not os.path.isdir(os.path.join(SCENE, "views")) or \
        "--rebuild" in sys.argv:
    from tests.synthetic import make_two_plane_scene

    if os.path.isdir(SCENE):
        shutil.rmtree(SCENE)
    make_two_plane_scene(SCENE, n_views=10, width=640, height=480,
                         seed=42, with_cameras=False)
    from mve_tpu.apps.sfmrecon import sfm_reconstruct

    t0 = time.time()
    sfm_reconstruct(SCENE, verbose=False)
    print(f"sfm took {time.time()-t0:.1f}s")

from mve_tpu.apps.dmrecon import reconstruct_views, LAST_STATS
from mve_tpu.mvs import Settings

t0 = time.time()
n = reconstruct_views(SCENE, scale=2,
                      settings=Settings(num_sweep_planes=24,
                                        num_propagation_iters=6),
                      verbose=False, force=True)
dt = time.time() - t0
print(f"mvs took {dt:.1f}s for {n} views")
fills = LAST_STATS.get("per_view_fills", {})
for i, r in enumerate(REF_FILLS):
    f = fills.get(i, float("nan"))
    print(f"view {i}: {f:.3f} vs ref {r:.3f} ({f-r:+.3f})")
vals = [fills[i] for i in sorted(fills)]
print(f"MEAN {np.mean(vals):.4f} vs ref {np.mean(REF_FILLS):.4f}")
