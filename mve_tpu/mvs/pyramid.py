"""Process-wide image pyramid cache (reference: libs/dmrecon/image_pyramid.cc
ImagePyramidCache — mutex-guarded cache keyed on (scene, embedding)).

Caches per-view grayscale level images so neighbor views are converted
and downsampled once per dmrecon batch instead of once per reference
view. Entries are plain numpy arrays; eviction by generation when a new
scene/embedding key appears (the reference's cache keeps one scene too).
"""

from __future__ import annotations

import threading
from typing import Dict, Tuple

import numpy as np


class ImagePyramidCache:
    _lock = threading.Lock()
    _key: Tuple[int, str] | None = None
    _levels: Dict[Tuple[int, int], np.ndarray] = {}

    @classmethod
    def get_level(cls, scene, view_id: int, embedding: str, level: int,
                  to_gray) -> np.ndarray:
        """Return the level-`level` grayscale image of a view, cached."""
        key = (id(scene), embedding)
        with cls._lock:
            if cls._key != key:
                cls._key = key
                cls._levels = {}
            cached = cls._levels.get((view_id, level))
        if cached is not None:
            return cached
        # Build from the nearest cached coarser... simplest: from level 0.
        with cls._lock:
            base = cls._levels.get((view_id, 0))
        if base is None:
            view = scene.get_views()[view_id]
            base = to_gray(view.get_image(embedding))
            with cls._lock:
                cls._levels[(view_id, 0)] = base
        img = base
        from ..core import image_tools
        import jax.numpy as jnp

        for lv in range(1, level + 1):
            with cls._lock:
                nxt = cls._levels.get((view_id, lv))
            if nxt is None:
                nxt = np.asarray(
                    image_tools.rescale_half_size_gaussian(jnp.asarray(img)[:, :, None])
                )[:, :, 0]
                with cls._lock:
                    cls._levels[(view_id, lv)] = nxt
            img = nxt
        return img

    @classmethod
    def cleanup(cls) -> None:
        with cls._lock:
            cls._key = None
            cls._levels = {}
