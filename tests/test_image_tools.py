"""Image tools + EXIF + focal extraction tests."""

import numpy as np
import jax.numpy as jnp

from mve_tpu.core import image_tools as it
from mve_tpu.core.image_exif import exif_extract
from mve_tpu.sfm.extract_focal_length import extract_focal_length, FocalLengthMethod


def test_rescale_half_even_odd():
    img = np.arange(6 * 8 * 1, dtype=np.float32).reshape(6, 8, 1)
    half = np.asarray(it.rescale_half_size(jnp.asarray(img)))
    assert half.shape == (3, 4, 1)
    # Box average of the top-left 2x2 block.
    np.testing.assert_allclose(half[0, 0, 0], np.mean([0, 1, 8, 9]))
    odd = np.asarray(it.rescale_half_size(jnp.asarray(img[:5, :7])))
    assert odd.shape == (3, 4, 1)


def test_blur_gaussian_preserves_mean():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 1).astype(np.float32)
    out = np.asarray(it.blur_gaussian(jnp.asarray(img), 2.0))
    assert abs(out.mean() - img.mean()) < 1e-3
    assert out.std() < img.std()


def test_undistort_identity():
    img = np.random.rand(20, 24, 3).astype(np.float32)
    out = np.asarray(it.image_undistort_k2k4(jnp.asarray(img), 1.0, 0.0, 0.0))
    np.testing.assert_allclose(out, img)
    out_v = np.asarray(it.image_undistort_vsfm(jnp.asarray(img), 1.0, 0.0))
    np.testing.assert_allclose(out_v, img)


def test_undistort_k2k4_moves_corners():
    img = np.zeros((21, 21, 1), np.float32)
    img[10, 10] = 1.0  # center dot
    out = np.asarray(it.image_undistort_k2k4(jnp.asarray(img), 1.0, 0.5, 0.0))
    # Center is fixed point of radial distortion.
    assert out[10, 10, 0] > 0.5


def test_undistort_k2k4_batch_matches_single():
    """The batched (B,H,W,C) undistortion used by sfmrecon must agree
    with the per-image path, per view, including byte conversion."""
    rng = np.random.RandomState(3)
    imgs = (rng.rand(3, 24, 20, 3) * 255).astype(np.uint8)
    flen = np.array([0.8, 1.0, 1.2], np.float32)
    k2 = np.array([0.3, -0.1, 0.0], np.float32)
    k4 = np.array([0.05, 0.0, 0.2], np.float32)
    batch = np.asarray(it.image_undistort_k2k4_batch(imgs, flen, k2, k4))
    for b in range(3):
        single = it.to_byte(np.asarray(it.image_undistort_k2k4(
            jnp.asarray(it.to_float(imgs[b])), float(flen[b]),
            float(k2[b]), float(k4[b]))))
        diff = np.abs(batch[b].astype(int) - single.astype(int))
        assert diff.max() <= 1, f"view {b}: max byte diff {diff.max()}"


def test_desaturate_modes():
    img = np.random.rand(4, 4, 3).astype(np.float32)
    for mode in ("luminosity", "luminance", "lightness", "average"):
        g = np.asarray(it.desaturate(jnp.asarray(img), mode))
        assert g.shape == (4, 4, 1)
        assert (g >= 0).all() and (g <= 1).all()


def test_bilinear_sample():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
    val = np.asarray(it.bilinear_sample(img, jnp.asarray([[1.5, 1.0]])))
    np.testing.assert_allclose(val[0, 0], (5 + 6) / 2.0)
    # Out of bounds -> fill.
    val2 = np.asarray(it.bilinear_sample(img, jnp.asarray([[10.0, 0.0]]), fill=-1.0))
    assert val2[0, 0] == -1.0


# ---------------------------------------------------------------------------
# EXIF
# ---------------------------------------------------------------------------

def _build_exif_blob():
    """Minimal little-endian TIFF/EXIF with maker/model + focal tags."""
    import struct

    # IFD0: Make (0x010F), Model (0x0110), ExifIFD pointer (0x8769)
    make = b"Canon\x00"
    model = b"Canon EOS 5D\x00"
    # Layout: header(8) + ifd0 + values + exif ifd
    ifd0_off = 8
    n0 = 3
    ifd0_size = 2 + n0 * 12 + 4
    make_off = ifd0_off + ifd0_size
    model_off = make_off + len(make)
    exif_off = model_off + len(model)
    n1 = 2
    exif_size = 2 + n1 * 12 + 4
    rat_off = exif_off + exif_size

    out = b"II" + struct.pack("<HI", 42, ifd0_off)
    out += struct.pack("<H", n0)
    out += struct.pack("<HHII", 0x010F, 2, len(make), make_off)
    out += struct.pack("<HHII", 0x0110, 2, len(model), model_off)
    out += struct.pack("<HHII", 0x8769, 4, 1, exif_off)
    out += struct.pack("<I", 0)
    out += make + model
    out += struct.pack("<H", n1)
    out += struct.pack("<HHII", 0x920A, 5, 1, rat_off)      # FocalLength 50/1
    out += struct.pack("<HHI", 0xA405, 3, 1) + struct.pack("<HH", 50, 0)  # 35mm = 50
    out += struct.pack("<I", 0)
    out += struct.pack("<II", 50, 1)
    return out


def test_exif_parse_and_focal():
    info = exif_extract(_build_exif_blob())
    assert info is not None
    assert info.camera_maker == "Canon"
    assert "EOS 5D" in info.camera_model
    assert info.focal_length == 50.0
    assert info.focal_length_35mm == 50.0
    flen, method = extract_focal_length(info)
    assert method == FocalLengthMethod.FROM_EXIF_35MM
    np.testing.assert_allclose(flen, 50.0 / 36.0)


def test_focal_fallback():
    flen, method = extract_focal_length(None)
    assert flen == 1.0 and method == FocalLengthMethod.FALLBACK


def test_focal_from_db():
    from mve_tpu.core.image_exif import ExifInfo

    info = ExifInfo(camera_maker="Canon", camera_model="Canon EOS 5D Mark II",
                    focal_length=35.0)
    flen, method = extract_focal_length(info)
    assert method == FocalLengthMethod.FROM_EXIF_DB
    np.testing.assert_allclose(flen, 35.0 / 36.0)


def test_camera_database_exact_lookup():
    """Exact maker/model sensor lookup (camera_database.cc:23-48
    simplification + full-string match), with >500 transcribed entries."""
    from mve_tpu.sfm.camera_database import lookup, simplify_string, CAMERA_MODELS

    assert len(CAMERA_MODELS) > 500
    # Simplification: non-alphanumeric runs -> single space, uppercase.
    assert simplify_string("Asahi Optical Co.,Ltd.  PENTAX Optio330RS") == \
        "ASAHI OPTICAL CO LTD PENTAX OPTIO330RS"
    m = lookup("Canon", "Canon EOS 5D Mark II")
    assert m is not None and abs(m.sensor_width_mm - 36.0) < 0.5
    m = lookup("NIKON CORPORATION", "NIKON D90")
    assert m is not None and 23.0 < m.sensor_width_mm < 24.2
    assert lookup("ACME", "Nonexistent 9000") is None


def test_extract_focal_length_exact_db():
    """EXIF with focal-in-mm + known body resolves through the exact DB."""
    from mve_tpu.core.image_exif import ExifInfo
    from mve_tpu.sfm.extract_focal_length import (FocalLengthMethod,
                                                  extract_focal_length)

    info = ExifInfo()
    info.camera_maker = "Canon"
    info.camera_model = "Canon EOS 40D"
    info.focal_length = 22.2  # equals sensor width -> normalized 1.0
    flen, method = extract_focal_length(info)
    assert method is FocalLengthMethod.FROM_EXIF_DB
    assert abs(flen - 1.0) < 1e-6
