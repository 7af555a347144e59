"""Measure the reference's track counts on the 100-view bench scene
(VERDICT r04 item #6): build the identical scene, run the freshly-built
reference sfmrecon, and record initial + final track counts."""
import os
import shutil
import subprocess
import sys
import time

SCENE = "/tmp/ref_scene_100"
REF_BIN = "/tmp/mve_ref_build/apps/sfmrecon/sfmrecon"

if not os.path.isdir(os.path.join(SCENE, "views")):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.synthetic import make_two_plane_scene

    if os.path.isdir(SCENE):
        shutil.rmtree(SCENE)
    t0 = time.time()
    make_two_plane_scene(SCENE, n_views=100, width=640, height=480,
                         seed=42, with_cameras=False)
    print(f"scene built in {time.time()-t0:.0f}s", flush=True)

pb = os.path.join(SCENE, "prebundle.sfm")
if os.path.isfile(pb):
    os.remove(pb)
t0 = time.time()
proc = subprocess.run([REF_BIN, SCENE], capture_output=True, text=True,
                      timeout=7200)
dt = time.time() - t0
lines = proc.stdout.splitlines()
for ln in lines:
    low = ln.lower()
    if ("track" in low or "cameras" in low or "pose" in low.split()[:1]
            or "bundle" in low) and "Removed" not in ln:
        print(ln)
print(f"reference sfmrecon rc={proc.returncode} took {dt:.0f}s")
if proc.returncode != 0:
    print(proc.stderr[-2000:])
