"""Per-view feature detection (reference: libs/sfm/bundler_features.cc).

For each view: load the color image, iteratively half-size it until it is
at or below max_pixels (bundler_features.cc:40-43), run SIFT (and SURF),
normalize positions to center (0,0) with larger dim 1, and record colors
at the feature locations. The reference parallelizes with OpenMP over
views; here each view's SIFT runs as jitted device pipelines and the host
loop streams views.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ...core import image_tools
from ..sift import detect_and_describe, SiftOptions
from .common import Viewport, normalize_feature_positions


@dataclasses.dataclass
class FeaturesOptions:
    max_image_size: int = 6_000_000  # pixels (sfmrecon.cc:48)
    sift_options: SiftOptions = dataclasses.field(default_factory=SiftOptions)
    # SIFT+SURF is the reference default (sfmrecon.cc:96 FEATURE_ALL);
    # SURF roughly doubles matchable features and with them track counts.
    use_surf: bool = True
    verbose: bool = False


class Features:
    def __init__(self, options: Optional[FeaturesOptions] = None):
        self.opts = options or FeaturesOptions()

    def compute_viewport(self, image: np.ndarray, viewport: Viewport) -> None:
        """Fill viewport features from one (H, W, C) uint8/float image."""
        img = image
        # Iterative half-size until <= max_pixels.
        while img.shape[0] * img.shape[1] > self.opts.max_image_size:
            import jax.numpy as jnp

            imgf = image_tools.to_float(img)
            img = np.asarray(image_tools.rescale_half_size(jnp.asarray(imgf)))
            img = (img * 255.0 + 0.5).astype(np.uint8) if image.dtype == np.uint8 else img

        h, w = img.shape[:2]
        viewport.width, viewport.height = w, h
        result = detect_and_describe(img, self.opts.sift_options)

        xs, ys = result.x, result.y
        viewport.descriptors = result.descriptors
        viewport.num_sift = len(result.x)
        if self.opts.use_surf:
            from ..surf import detect_and_describe as surf_detect

            surf_result = surf_detect(img)
            viewport.surf_descriptors = surf_result.descriptors
            xs = np.concatenate([xs, surf_result.x])
            ys = np.concatenate([ys, surf_result.y])

        xy = np.stack([xs, ys], axis=1)
        viewport.positions = normalize_feature_positions(xy, w, h)
        viewport.track_ids = np.full(len(xs), -1, np.int32)

        # Feature colors from the (possibly rescaled) image.
        xi = np.clip(np.round(xs).astype(int), 0, w - 1)
        yi = np.clip(np.round(ys).astype(int), 0, h - 1)
        if img.ndim == 3 and img.shape[2] >= 3:
            colors = img[yi, xi, :3]
        else:
            gray = img[yi, xi] if img.ndim == 2 else img[yi, xi, 0]
            colors = np.stack([gray] * 3, axis=1)
        if colors.dtype != np.uint8:
            colors = np.clip(colors * 255.0 + 0.5, 0, 255).astype(np.uint8)
        viewport.colors = colors

    def compute(self, images: List[np.ndarray], viewports: List[Viewport]) -> None:
        for i, (img, vp) in enumerate(zip(images, viewports)):
            self.compute_viewport(img, vp)
            if self.opts.verbose:
                print(f"View {i}: {len(vp.positions)} features")

    def compute_batched(self, images: List[np.ndarray],
                        viewports: List[Viewport]) -> None:
        """Batched SIFT across same-shape views (3 dispatches per octave
        for the WHOLE batch) + per-view SURF when enabled (FEATURE_ALL,
        the reference default); falls back per-view for mixed shapes."""
        # Apply the same max-pixels policy first.
        import jax.numpy as jnp

        prepped = []
        for img in images:
            while img.shape[0] * img.shape[1] > self.opts.max_image_size:
                imgf = image_tools.to_float(img)
                img2 = np.asarray(image_tools.rescale_half_size(jnp.asarray(imgf)))
                img = (image_tools.to_byte(img2) if img.dtype == np.uint8 else img2)
            prepped.append(img)
        from ..sift import detect_and_describe_batch

        results = detect_and_describe_batch(prepped, self.opts.sift_options)
        if self.opts.use_surf:
            from ..surf import detect_and_describe_batch as surf_batch

            surf_results = surf_batch(prepped)
        else:
            surf_results = [None] * len(prepped)
        for i, (img, vp, result, sresult) in enumerate(
                zip(prepped, viewports, results, surf_results)):
            h, w = img.shape[:2]
            vp.width, vp.height = w, h
            xs, ys = result.x, result.y
            vp.descriptors = result.descriptors
            vp.num_sift = len(result.x)
            if sresult is not None:
                vp.surf_descriptors = sresult.descriptors
                xs = np.concatenate([xs, sresult.x])
                ys = np.concatenate([ys, sresult.y])
            xy = np.stack([xs, ys], axis=1)
            vp.positions = normalize_feature_positions(xy, w, h)
            vp.track_ids = np.full(len(xs), -1, np.int32)
            xi = np.clip(np.round(xs).astype(int), 0, w - 1)
            yi = np.clip(np.round(ys).astype(int), 0, h - 1)
            if img.ndim == 3 and img.shape[2] >= 3:
                colors = img[yi, xi, :3]
            else:
                gray = img[yi, xi] if img.ndim == 2 else img[yi, xi, 0]
                colors = np.stack([gray] * 3, axis=1)
            if colors.dtype != np.uint8:
                colors = np.clip(colors * 255.0 + 0.5, 0, 255).astype(np.uint8)
            vp.colors = colors
            if self.opts.verbose:
                print(f"View {i}: {len(vp.positions)} features")
