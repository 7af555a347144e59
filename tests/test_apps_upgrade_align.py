"""Tests for sceneupgrade (legacy container/prebundle conversion) and
meshalign (.aln Meshlab alignments)."""

import os
import struct

import numpy as np
import pytest

from mve_tpu.apps.meshalign import mesh_align, read_meshlab_alignment
from mve_tpu.apps.sceneupgrade import (
    LEGACY_MATCHING_SIGNATURE, LEGACY_VIEW_SIGNATURE,
    LEGACY_VIEWPORTS_SIGNATURE, scene_upgrade)
from mve_tpu.core import mesh_io
from mve_tpu.core.mesh import TriangleMesh
from mve_tpu.core.view import View
from mve_tpu.sfm.bundler.common import (load_prebundle,
                                        normalize_feature_positions)


def _write_legacy_view(path, img, blob, rot, trans, flen):
    """Emit the deprecated single-file .mve container (view.cc:56-178)."""
    hdr = [b"id 7", b"name legacy view"]
    hdr.append(("camera-ext " + " ".join(f"{v:.6f}" for v in trans) + " "
                + " ".join(f"{v:.6f}" for v in rot)).encode())
    hdr.append(f"camera-int {flen:.6f}".encode())
    hdr.append(f"image undist-L1 {img.shape[1]} {img.shape[0]} "
               f"{img.shape[2]} uint8".encode())
    hdr.append(f"data desc {len(blob)}".encode())
    hdr.append(b"end_headers")
    with open(path, "wb") as f:
        f.write(LEGACY_VIEW_SIGNATURE)
        f.write(b"\n".join(hdr) + b"\n")
        f.write(f"embedding undist-L1 {img.nbytes}\n".encode())
        f.write(img.tobytes() + b"\n")
        f.write(f"embedding desc {len(blob)}\n".encode())
        f.write(blob + b"\n")


def test_sceneupgrade_view(tmp_path):
    scene = tmp_path / "scene"
    views = scene / "views"
    views.mkdir(parents=True)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (6, 8, 3), np.uint8)
    blob = b"\x01\x02payload\x00\xff"
    rot = np.eye(3).ravel()
    trans = np.array([0.5, -1.0, 2.0])
    vpath = views / "view_0007.mve"
    _write_legacy_view(str(vpath), img, blob, rot, trans, 0.85)

    scene_upgrade(str(scene), verbose=False)

    assert os.path.isdir(vpath)
    v = View(str(vpath))
    assert v.id == 7
    assert v.name == "legacy view"
    np.testing.assert_array_equal(v.get_image("undist-L1"), img)
    assert v.get_blob("desc") == blob
    cam = v.camera
    assert cam.flen == pytest.approx(0.85)
    np.testing.assert_allclose(cam.trans, trans, atol=1e-5)


def test_sceneupgrade_view_keep_original(tmp_path):
    views = tmp_path / "scene" / "views"
    views.mkdir(parents=True)
    img = np.zeros((2, 2, 1), np.uint8)
    vpath = views / "view_0000.mve"
    _write_legacy_view(str(vpath), img, b"x", np.eye(3).ravel(),
                       np.zeros(3), 1.0)
    scene_upgrade(str(tmp_path / "scene"), keep_original=True, verbose=False)
    assert os.path.isfile(str(vpath) + ".orig")


def _write_legacy_prebundle(path, width, height, pos_px, colors, track_ids,
                            pairs):
    with open(path, "wb") as f:
        f.write(LEGACY_VIEWPORTS_SIGNATURE)
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<iiff", width, height, 0.9, 0.01))
        f.write(struct.pack("<i", len(pos_px)))
        f.write(np.asarray(pos_px, "<f4").tobytes())
        f.write(struct.pack("<i", len(colors)))
        f.write(np.asarray(colors, np.uint8).tobytes())
        f.write(struct.pack("<i", len(track_ids)))
        f.write(np.asarray(track_ids, "<i4").tobytes())
        f.write(LEGACY_MATCHING_SIGNATURE)
        f.write(struct.pack("<i", len(pairs)))
        for (v1, v2, matches) in pairs:
            f.write(struct.pack("<iii", v1, v2, len(matches)))
            f.write(np.asarray(matches, "<i4").tobytes())


def test_sceneupgrade_prebundle(tmp_path):
    path = tmp_path / "prebundle.sfm"
    pos_px = np.array([[10.0, 20.0], [100.0, 50.0]], np.float32)
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    matches = np.array([[0, 1], [1, 0]], np.int32)
    _write_legacy_prebundle(str(path), 200, 100, pos_px, colors,
                            np.array([3, -1], np.int32),
                            [(0, 1, matches)])
    scene_upgrade(str(path), verbose=False)

    viewports, matching = load_prebundle(str(path))
    assert len(viewports) == 1
    expected = normalize_feature_positions(pos_px.astype(np.float64),
                                           200, 100)
    np.testing.assert_allclose(viewports[0].positions, expected, atol=1e-6)
    np.testing.assert_array_equal(viewports[0].colors, colors)
    assert len(matching) == 1
    assert (matching[0].view_1_id, matching[0].view_2_id) == (0, 1)
    np.testing.assert_array_equal(matching[0].matches, matches)


def test_sceneupgrade_prebundle_skips_new_format(tmp_path):
    path = tmp_path / "prebundle.sfm"
    from mve_tpu.sfm.bundler.common import save_prebundle
    save_prebundle([], [], str(path))
    before = path.read_bytes()
    scene_upgrade(str(path), verbose=False)
    assert path.read_bytes() == before


def _tri_mesh(offset=0.0):
    m = TriangleMesh()
    m.vertices = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                          np.float32) + offset
    m.faces = np.array([[0, 1, 2]], np.int32)
    return m


def test_meshalign_aln(tmp_path):
    mesh_io.save_mesh(_tri_mesh(), str(tmp_path / "scan0.ply"))
    mesh_io.save_mesh(_tri_mesh(), str(tmp_path / "scan1.ply"))
    # 90 deg rotation about z + translation for the second scan.
    aln = tmp_path / "align.aln"
    aln.write_text(
        "# comment line\n"
        "2\n\n"
        "scan0.ply\n"
        "1 0 0 0\n0 1 0 0\n0 0 1 0\n0 0 0 1\n"
        "scan1.ply\n"
        "0 -1 0 2\n1 0 0 0\n0 0 1 -1\n0 0 0 1\n")

    entries = read_meshlab_alignment(str(aln))
    assert len(entries) == 2
    assert entries[0][0].endswith("scan0.ply")
    np.testing.assert_allclose(entries[1][1][:3, 3], [2, 0, -1])

    merged = mesh_align([str(aln)], str(tmp_path / "out.ply"),
                        verbose=False)
    assert merged.num_vertices() == 6
    # Second scan's vertex (1,0,0) -> R*(1,0,0)+T = (2,1,-1).
    np.testing.assert_allclose(merged.vertices[4], [2, 1, -1], atol=1e-6)
