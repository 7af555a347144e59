"""Focal length estimation from EXIF (reference:
libs/sfm/extract_focal_length.h:36-55, camera_database.cc).

Priority: (1) 35mm-equivalent focal length from EXIF; (2) focal length in
mm plus sensor width from a maker/model database; (3) fallback 1.0
(a common default for compact cameras). The returned value is the focal
length normalized by the larger image dimension (35mm frame: 36mm wide).
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

from ..core.image_exif import ExifInfo


class FocalLengthMethod(enum.Enum):
    FROM_EXIF_35MM = 0
    FROM_EXIF_DB = 1
    FALLBACK = 2


# Sensor widths in mm, keyed on (maker substring, model substring),
# lower-case. Public spec-sheet facts for common camera families — the
# reference ships a much larger hardcoded list (camera_database.cc:680
# lines); extend as needed.
SENSOR_WIDTH_DB = [
    ("canon", "powershot", 5.76),
    ("canon", "eos 5d", 36.0),
    ("canon", "eos 6d", 35.8),
    ("canon", "eos 7d", 22.3),
    ("canon", "eos", 22.3),
    ("nikon", "d3", 36.0),
    ("nikon", "d4", 36.0),
    ("nikon", "d7", 23.5),
    ("nikon", "d5", 23.5),
    ("nikon", "d90", 23.6),
    ("nikon", "coolpix", 6.16),
    ("sony", "ilce-7", 35.8),
    ("sony", "nex", 23.5),
    ("sony", "dsc", 6.16),
    ("fujifilm", "x-t", 23.6),
    ("fujifilm", "finepix", 6.4),
    ("olympus", "e-m", 17.3),
    ("panasonic", "dmc-g", 17.3),
    ("panasonic", "dmc", 6.08),
    ("apple", "iphone", 4.89),
    ("samsung", "sm-", 5.76),
    ("google", "pixel", 6.17),
]


def lookup_sensor_width(maker: str, model: str) -> Optional[float]:
    maker_l = maker.lower()
    model_l = model.lower()
    for m, mod, width in SENSOR_WIDTH_DB:
        if m in maker_l and mod in model_l:
            return width
    return None


def extract_focal_length(exif: Optional[ExifInfo]) -> Tuple[float, FocalLengthMethod]:
    """Returns (normalized_focal_length, method)."""
    if exif is not None:
        if exif.focal_length_35mm > 0:
            return exif.focal_length_35mm / 36.0, FocalLengthMethod.FROM_EXIF_35MM
        if exif.focal_length > 0:
            width = lookup_sensor_width(exif.camera_maker, exif.camera_model)
            if width is not None:
                return exif.focal_length / width, FocalLengthMethod.FROM_EXIF_DB
    return 1.0, FocalLengthMethod.FALLBACK
