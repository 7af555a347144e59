"""Bundle file I/O (reference: libs/mve/bundle_io.cc).

Supported formats:

- MVE native == Photosynther text format ("drews 1.0" header), used for
  ``synth_0.out`` (bundle_io.cc:218-280 format doc, :430-500 writer).
- Noah Bundler v0.3 ("# Bundle file v0.3" header): same camera block,
  refs additionally carry image-centered float x/y (bundle_io.cc:242-264).
- VisualSFM NVM (bundle_io.cc:100-215).
- COLMAP text model (cameras.txt / images.txt / points3D.txt).

All parsers are text-based and byte-compatible with the reference's output.
"""

from __future__ import annotations

import os

import numpy as np

from .bundle import Bundle, Feature2D, Feature3D
from .camera import CameraInfo


# ---------------------------------------------------------------------------
# MVE / Photosynther and Noah Bundler (common structure)
# ---------------------------------------------------------------------------

def load_mve_bundle(path: str) -> Bundle:
    return _load_bundler_ps(path, "photosynther")


def save_mve_bundle(bundle: Bundle, path: str) -> None:
    save_photosynther_bundle(bundle, path)


def load_photosynther_bundle(path: str) -> Bundle:
    return _load_bundler_ps(path, "photosynther")


def load_bundler_bundle(path: str) -> Bundle:
    return _load_bundler_ps(path, "bundler")


def _load_bundler_ps(path: str, fmt: str) -> Bundle:
    with open(path, "r") as f:
        tokens = f.read().split()
    it = iter(tokens)

    def nxt():
        return next(it)

    # Header: "drews 1.0" or "# Bundle file v0.3"
    if fmt == "photosynther":
        magic = nxt() + " " + nxt()
        if magic != "drews 1.0":
            raise IOError(f"{path}: invalid Photosynther signature {magic!r}")
    else:
        magic = " ".join(nxt() for _ in range(4))
        if magic != "# Bundle file v0.3":
            raise IOError(f"{path}: invalid Bundler signature {magic!r}")

    num_cameras = int(nxt())
    num_features = int(nxt())
    bundle = Bundle()
    for _ in range(num_cameras):
        vals = np.array([float(nxt()) for _ in range(15)], np.float64)
        cam = CameraInfo()
        cam.flen = float(vals[0])
        cam.dist = vals[1:3].astype(np.float32)
        cam.rot = vals[3:12].reshape(3, 3).astype(np.float32)
        cam.trans = vals[12:15].astype(np.float32)
        bundle.cameras.append(cam)

    for _ in range(num_features):
        pos = np.array([float(nxt()) for _ in range(3)], np.float32)
        color = np.array([float(nxt()) for _ in range(3)], np.float32) / 255.0
        nrefs = int(nxt())
        refs = []
        for _ in range(nrefs):
            view_id = int(nxt())
            feat_id = int(nxt())
            if fmt == "photosynther":
                nxt()  # reprojection quality, discarded (bundle_io.cc:375)
                refs.append(Feature2D(view_id, feat_id))
            else:
                x = float(nxt())
                y = float(nxt())
                refs.append(Feature2D(view_id, feat_id, np.array([x, y], np.float32)))
        bundle.features.append(Feature3D(pos, color, refs))
    return bundle


def save_photosynther_bundle(bundle: Bundle, path: str) -> None:
    """Write the MVE native bundle (bundle_io.cc save_photosynther_bundle)."""
    lines = ["drews 1.0", f"{len(bundle.cameras)} {len(bundle.features)}"]
    for cam in bundle.cameras:
        valid = (
            cam.flen != 0.0
            and np.all(np.isfinite(cam.trans))
            and np.all(np.isfinite(cam.rot))
        )
        if not valid:
            lines.extend(["0 0 0"] * 5)
            continue
        r = cam.rot.reshape(-1)
        lines.append(f"{_fmt(cam.flen)} {_fmt(cam.dist[0])} {_fmt(cam.dist[1])}")
        lines.append(f"{_fmt(r[0])} {_fmt(r[1])} {_fmt(r[2])}")
        lines.append(f"{_fmt(r[3])} {_fmt(r[4])} {_fmt(r[5])}")
        lines.append(f"{_fmt(r[6])} {_fmt(r[7])} {_fmt(r[8])}")
        lines.append(f"{_fmt(cam.trans[0])} {_fmt(cam.trans[1])} {_fmt(cam.trans[2])}")
    for feat in bundle.features:
        lines.append(f"{_fmt(feat.pos[0])} {_fmt(feat.pos[1])} {_fmt(feat.pos[2])}")
        c = [int(x * 255.0 + 0.5) for x in feat.color]
        lines.append(f"{c[0]} {c[1]} {c[2]}")
        ref_str = " ".join(f"{r.view_id} {r.feature_id} 0" for r in feat.refs)
        lines.append(f"{len(feat.refs)}" + (" " + ref_str if ref_str else ""))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _fmt(x: float) -> str:
    """Compact float formatting comparable to C++ operator<< defaults."""
    return f"{float(x):.9g}"


# ---------------------------------------------------------------------------
# VisualSFM NVM (bundle_io.cc:100-215)
# ---------------------------------------------------------------------------

def load_nvm_bundle(path: str):
    """Load an NVM_V3 file. Returns (bundle, camera_infos) where
    camera_infos is a list of dicts with image paths and radial distortion
    (NVM stores distortion separately from the bundle camera model)."""
    with open(path, "r") as f:
        content = f.read().split("\n")
    idx = 0

    def next_nonempty():
        nonlocal idx
        while idx < len(content) and not content[idx].strip():
            idx += 1
        line = content[idx]
        idx += 1
        return line

    header = next_nonempty().strip()
    if not header.startswith("NVM_V3"):
        raise IOError(f"{path}: invalid NVM signature")
    num_views = int(next_nonempty())
    bundle = Bundle()
    view_meta = []
    for _ in range(num_views):
        parts = next_nonempty().split()
        name = parts[0]
        flen_px = float(parts[1])
        quat = np.array([float(x) for x in parts[2:6]])
        center = np.array([float(x) for x in parts[6:9]])
        k1 = float(parts[9])
        from ..math.rotation import quat_to_matrix

        cam = CameraInfo()
        R = np.asarray(quat_to_matrix(quat))
        cam.rot = R.astype(np.float32)
        cam.trans = (-R @ center).astype(np.float32)
        cam.flen = flen_px  # pixel units; normalized by caller w/ image dims
        view_meta.append({"filename": name, "focal_px": flen_px, "nvm_k1": k1})
        bundle.cameras.append(cam)
    num_features = int(next_nonempty())
    for _ in range(num_features):
        parts = next_nonempty().split()
        pos = np.array([float(x) for x in parts[0:3]], np.float32)
        color = np.array([float(x) for x in parts[3:6]], np.float32) / 255.0
        nrefs = int(parts[6])
        refs = []
        for r in range(nrefs):
            base = 7 + r * 4
            refs.append(
                Feature2D(
                    int(parts[base]),
                    int(parts[base + 1]),
                    np.array([float(parts[base + 2]), float(parts[base + 3])], np.float32),
                )
            )
        bundle.features.append(Feature3D(pos, color, refs))
    return bundle, view_meta


# ---------------------------------------------------------------------------
# COLMAP text model (bundle_io.cc:500+ — cameras.txt/images.txt/points3D.txt)
# ---------------------------------------------------------------------------

def load_colmap_bundle(model_dir: str):
    """Load a COLMAP text model directory. Returns (bundle, view_meta)."""
    cams_path = os.path.join(model_dir, "cameras.txt")
    images_path = os.path.join(model_dir, "images.txt")
    points_path = os.path.join(model_dir, "points3D.txt")

    intrinsics = {}
    with open(cams_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam_id = int(parts[0])
            model = parts[1]
            width, height = int(parts[2]), int(parts[3])
            params = [float(x) for x in parts[4:]]
            intrinsics[cam_id] = {"model": model, "width": width, "height": height, "params": params}

    bundle = Bundle()
    view_meta = []
    image_id_to_index = {}
    with open(images_path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.lstrip().startswith("#")]
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        image_id = int(parts[0])
        qw, qx, qy, qz = (float(x) for x in parts[1:5])
        tx, ty, tz = (float(x) for x in parts[5:8])
        cam_id = int(parts[8])
        name = parts[9]
        info = intrinsics[cam_id]
        from ..math.rotation import quat_to_matrix

        cam = CameraInfo()
        cam.rot = np.asarray(quat_to_matrix(np.array([qw, qx, qy, qz]))).astype(np.float32)
        cam.trans = np.array([tx, ty, tz], np.float32)
        maxdim = max(info["width"], info["height"])
        params = info["params"]
        if info["model"] in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
            focal_px = params[0]
            k = params[3:] if info["model"] != "SIMPLE_PINHOLE" else []
        elif info["model"] in ("PINHOLE", "OPENCV"):
            focal_px = 0.5 * (params[0] + params[1])
            k = params[4:6] if info["model"] == "OPENCV" else []
        else:
            focal_px = params[0]
            k = []
        cam.flen = focal_px / maxdim
        if k:
            cam.dist = np.array((k + [0.0, 0.0])[:2], np.float32)
        image_id_to_index[image_id] = len(bundle.cameras)
        bundle.cameras.append(cam)
        view_meta.append({"filename": name, "width": info["width"], "height": info["height"]})

    with open(points_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            pos = np.array([float(x) for x in parts[1:4]], np.float32)
            color = np.array([float(x) for x in parts[4:7]], np.float32) / 255.0
            refs = []
            track = parts[8:]
            for j in range(0, len(track), 2):
                img_id = int(track[j])
                pt2d_id = int(track[j + 1])
                if img_id in image_id_to_index:
                    refs.append(Feature2D(image_id_to_index[img_id], pt2d_id))
            bundle.features.append(Feature3D(pos, color, refs))
    return bundle, view_meta
