"""Stage-level SIFT profiling on the real TPU (VERDICT r04 weak #2)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import mve_tpu  # noqa: F401  (sets matmul precision)
from mve_tpu.sfm import sift
from mve_tpu.core import image_tools
from tests.synthetic import make_texture, make_cameras, render_two_plane_view

W, H, B = 640, 480, 10
tex_far = make_texture(seed=0, smooth_sigma=3.0)
tex_near = make_texture(seed=100, smooth_sigma=3.0)
cams = make_cameras(B, spread=0.55, seed=0)
imgs = [render_two_plane_view(tex_far, tex_near, c, W, H) for c in cams]
opts = sift.SiftOptions()
S = opts.num_samples_per_octave

print("devices:", jax.devices())

grays = [sift._to_gray_f32(im) for im in imgs]
batch = jnp.asarray(np.stack(grays))


def run(report=False):
    base = batch
    img_sigma = opts.inherent_blur_sigma
    o = 0
    t_detect = t_ori = t_compact = t_desc = t_down = t_fetch = 0.0
    totals = {}
    outs = []
    while o <= opts.max_octave and base.shape[1] >= 16 and base.shape[2] >= 16:
        Ho, Wo = base.shape[1], base.shape[2]
        cap = min(opts.max_keypoints_per_octave, max(256, S * Ho * Wo // 64))
        cap = sift._pad_to_bucket(cap, opts.max_keypoints_per_octave)
        t0 = time.perf_counter()
        det = jax.vmap(lambda im: sift._octave_detect(
            im, S, opts.base_blur_sigma, float(img_sigma), cap,
            opts.eff_contrast_threshold, opts.edge_ratio_threshold))(base)
        jax.block_until_ready(det)
        t1 = time.perf_counter()
        gauss, x, y, s, keep = det
        x, y, s, keep = jax.vmap(sift._compact_keypoints)(x, y, s, keep)
        jax.block_until_ready((x, keep))
        orr = jax.vmap(lambda g, xx, yy, ss, kk: sift._octave_orientations(
            g, xx, yy, ss, kk, S, opts.base_blur_sigma,
            opts.max_orientations_per_keypoint))(gauss, x, y, s, keep)
        jax.block_until_ready(orr)
        t2 = time.perf_counter()
        grad, orient, oris, ori_valid = orr
        comp = jax.vmap(lambda xx, yy, ss, oo, ov, kk: sift._compact_slots(
            xx, yy, ss, oo, ov, kk, opts.max_orientations_per_keypoint))(
                x, y, s, oris, ori_valid, keep)
        jax.block_until_ready(comp)
        t3 = time.perf_counter()
        xd, yd, sd, od, vd = comp
        desc, ok = jax.vmap(lambda g, orn, xx, yy, ss, oo, vv:
                            sift._compute_descriptors(
                                g, orn, xx, yy, ss, oo, vv, S,
                                opts.base_blur_sigma))(
            grad, orient, xd, yd, sd, od, vd)
        jax.block_until_ready((desc, ok))
        t4 = time.perf_counter()
        base = sift._half_size_batch(base)
        jax.block_until_ready(base)
        t5 = time.perf_counter()
        outs.append((ok, desc))
        if report:
            nk = int(np.asarray(keep).sum())
            nv = int(np.asarray(vd).sum())
            print(f"oct{o} cap={cap:5d} kp={nk:6d} slots={nv:6d} "
                  f"detect={1e3*(t1-t0):7.1f} ori={1e3*(t2-t1):7.1f} "
                  f"compact={1e3*(t3-t2):7.1f} desc={1e3*(t4-t3):7.1f} "
                  f"down={1e3*(t5-t4):6.1f}")
        t_detect += t1 - t0
        t_ori += t2 - t1
        t_compact += t3 - t2
        t_desc += t4 - t3
        t_down += t5 - t4
        img_sigma = opts.base_blur_sigma
        o += 1
    t0 = time.perf_counter()
    n = sum(int(np.asarray(ok).sum()) for ok, _ in outs)
    t_fetch = time.perf_counter() - t0
    if report:
        print(f"SUM detect={t_detect:.2f}s ori={t_ori:.2f}s "
              f"compact={t_compact:.2f}s desc={t_desc:.2f}s "
              f"down={t_down:.2f}s fetch={t_fetch:.2f}s n={n}")


print("warmup (compiles)...")
t0 = time.perf_counter()
run()
print(f"warmup took {time.perf_counter()-t0:.1f}s")
for _ in range(2):
    t0 = time.perf_counter()
    run(report=True)
    print(f"steady total {time.perf_counter()-t0:.2f}s")

# Reference: the production entry, end to end.
from mve_tpu.sfm.sift import detect_and_describe_batch
t0 = time.perf_counter()
res = detect_and_describe_batch(imgs, opts)
print(f"production batch (warm): {time.perf_counter()-t0:.2f}s, "
      f"n={sum(len(r) for r in res)}")
t0 = time.perf_counter()
res = detect_and_describe_batch(imgs, opts)
print(f"production batch (warm2): {time.perf_counter()-t0:.2f}s")
