"""makescene: images / SfM workspaces -> MVE scene directory
(reference: apps/makescene/makescene.cc).

Supported inputs:
- a directory of images (``-i``): one view per image with the original
  embedding and an "exif" blob for JPEGs (makescene.cc:969 import_images);
- an NVM file or COLMAP model directory: views + synth_0.out bundle
  with undistorted images (makescene.cc:341 import_bundle_nvm_or_colmap).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..core import Scene, View, CameraInfo
from ..core import image_io, bundle_io, image_tools

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".tif", ".tiff", ".ppm", ".pgm", ".pfm", ".bmp")


def import_images(input_dir: str, scene_path: str, max_pixels: int = 0) -> int:
    """One view per image (makescene.cc import_images)."""
    scene = Scene.create(scene_path)
    files = sorted(
        f for f in os.listdir(input_dir)
        if os.path.splitext(f)[1].lower() in IMAGE_EXTS)
    view_id = 0
    for fname in files:
        src = os.path.join(input_dir, fname)
        try:
            img = image_io.load_image(src)
        except Exception as exc:
            print(f"Skipping {fname}: {exc}", file=sys.stderr)
            continue
        while max_pixels > 0 and img.shape[0] * img.shape[1] > max_pixels:
            imgf = image_tools.to_float(img)
            img = image_tools.to_byte(np.asarray(image_tools.rescale_half_size(imgf)))
        view = View.create(scene.view_dir_for_id(view_id), view_id,
                           os.path.splitext(fname)[0])
        exif = b""
        if os.path.splitext(fname)[1].lower() in (".jpg", ".jpeg"):
            exif = image_io.load_jpeg_exif(src)
        if exif:
            view.set_blob("exif", exif)
        if max_pixels > 0:
            view.set_original_image(img)
            view.save_view()
        else:
            view.save_view_as(view.get_directory(), original_src=src)
        scene.add_view(view)
        view_id += 1
    print(f"Imported {view_id} images into {scene_path}")
    return view_id


def import_bundle(input_path: str, scene_path: str, fmt: str = "auto") -> int:
    """NVM file or COLMAP model dir -> scene + bundle."""
    if fmt == "auto":
        fmt = "nvm" if input_path.endswith(".nvm") else "colmap"
    if fmt == "nvm":
        bundle, meta = bundle_io.load_nvm_bundle(input_path)
        base = os.path.dirname(input_path)
    else:
        bundle, meta = bundle_io.load_colmap_bundle(input_path)
        base = os.path.join(input_path, "..", "images")
    scene = Scene.create(scene_path)
    for i, (cam, m) in enumerate(zip(bundle.cameras, meta)):
        view = View.create(scene.view_dir_for_id(i), i,
                           os.path.splitext(os.path.basename(m["filename"]))[0])
        img_path = m["filename"]
        if not os.path.isabs(img_path):
            img_path = os.path.join(base, img_path)
        if os.path.isfile(img_path):
            img = image_io.load_image(img_path)
            h, w = img.shape[:2]
            if fmt == "nvm" and cam.flen > 10:  # pixel-unit focal from NVM
                cam = cam.copy()
                cam.flen = cam.flen / max(w, h)
            view.set_image("undistorted", img)
        view.set_camera(cam)
        view.save_view()
        scene.add_view(view)
    scene.set_bundle(bundle)
    scene.save_bundle()
    print(f"Imported bundle with {len(bundle.cameras)} cameras into {scene_path}")
    return len(bundle.cameras)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="makescene", description="Create MVE scene from images or SfM exports.")
    p.add_argument("input", help="Input directory (images or COLMAP model) or NVM file")
    p.add_argument("scene", help="Output scene directory")
    p.add_argument("-i", "--images-only", action="store_true",
                   help="Import images from INPUT_DIR only")
    p.add_argument("-m", "--max-pixels", type=int, default=0,
                   help="Limit image size by iterative half-sizing")
    args = p.parse_args(argv)

    if args.images_only or (os.path.isdir(args.input)
                            and not os.path.isfile(os.path.join(args.input, "cameras.txt"))):
        import_images(args.input, args.scene, args.max_pixels)
    else:
        import_bundle(args.input, args.scene)
    return 0


if __name__ == "__main__":
    sys.exit(main())
