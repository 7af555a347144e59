"""All-pairs geometric-verified matching
(reference: libs/sfm/bundler_matching.cc).

Per pair: optional low-res prefilter (match the first N descriptors,
reject if < min_lowres_matches), full two-way Lowe matching, reject below
min_feature_matches (24), RANSAC fundamental, reject below
min_matching_inliers (12). Pairs are the embarrassingly-parallel axis —
the reference uses OpenMP over pairs (bundler_matching.cc:74); here each
pair's NN search is one MXU matmul and the host streams pairs (view/pair
sharding across hosts is the distributed axis, SURVEY.md §2.9).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .. import matching as M
from ..ransac import ransac_fundamental, RansacOptions
from .common import Viewport, TwoViewMatching


@dataclasses.dataclass
class MatchingOptions:
    """bundler_matching.h Options defaults."""

    min_lowres_matches: int = 5
    num_lowres_features: int = 500
    min_feature_matches: int = 24
    min_matching_inliers: int = 12
    use_lowres_matching: bool = False
    use_cascade_hashing: bool = False  # sfmrecon.cc:141-153 matcher select
    max_num_pairs_per_view: int = 0  # 0 = all pairs; >0 = video mode window
    ransac_opts: RansacOptions = dataclasses.field(
        default_factory=lambda: RansacOptions(max_iterations=1000, threshold=0.0015))
    lowe_ratio: float = 0.8
    verbose: bool = False


class Matching:
    def __init__(self, options: Optional[MatchingOptions] = None):
        self.opts = options or MatchingOptions()

    def two_view_matching(self, vp1: Viewport, vp2: Viewport,
                          rng: np.random.RandomState,
                          cascade_pair=None) -> Optional[np.ndarray]:
        """Returns (M, 2) verified matches or None (bundler_matching.cc
        two_view_matching). cascade_pair: optional callable returning the
        SIFT-block matches via the cascade-hashing matcher."""
        opts = self.opts
        if opts.use_lowres_matching:
            n = opts.num_lowres_features
            lowres = M.match_pair(
                vp1.descriptors[:n], vp2.descriptors[:n],
                M.MatchingOptions(lowe_ratio_threshold=opts.lowe_ratio))
            if len(lowres) < opts.min_lowres_matches:
                return None
        if cascade_pair is not None:
            pairs = cascade_pair()
        else:
            pairs = M.match_pair(
                vp1.descriptors, vp2.descriptors,
                M.MatchingOptions(lowe_ratio_threshold=opts.lowe_ratio))
        # SURF features matched separately, combined with index offsets
        # past the SIFT block (matching.cc combine_results).
        if len(vp1.surf_descriptors) and len(vp2.surf_descriptors):
            surf_pairs = M.match_pair(
                vp1.surf_descriptors, vp2.surf_descriptors,
                M.MatchingOptions(lowe_ratio_threshold=0.7))
            if len(surf_pairs):
                surf_pairs = surf_pairs + np.array(
                    [vp1.num_sift, vp2.num_sift], np.int32)
                pairs = np.concatenate([pairs, surf_pairs]) if len(pairs) else surf_pairs
        if len(pairs) < opts.min_feature_matches:
            return None
        p1 = vp1.positions[pairs[:, 0]]
        p2 = vp2.positions[pairs[:, 1]]
        try:
            result = ransac_fundamental(p1, p2, opts.ransac_opts, rng=rng)
        except ValueError:
            return None
        if len(result.inliers) < opts.min_matching_inliers:
            return None
        return pairs[result.inliers]

    def compute(self, viewports: List[Viewport],
                seed: int = 0) -> List[TwoViewMatching]:
        """Match all O(N^2/2) pairs (bundler_matching.cc:59-89)."""
        opts = self.opts
        n = len(viewports)
        rng = np.random.RandomState(seed)
        pairs = []
        for v1 in range(n):
            for v2 in range(v1):
                if opts.max_num_pairs_per_view > 0 and v1 - v2 > opts.max_num_pairs_per_view:
                    continue  # video mode: only K previous frames
                pairs.append((v2, v1))
        cascade = None
        if opts.use_cascade_hashing:
            from ..cascade_hashing import CascadeHashing

            cascade = CascadeHashing()
            cascade.init([vp.descriptors for vp in viewports])
        result = []
        for (a, b) in pairs:
            cascade_pair = None
            if cascade is not None:
                mopts = M.MatchingOptions(lowe_ratio_threshold=opts.lowe_ratio)

                def cascade_pair(a=a, b=b, mopts=mopts):
                    res = cascade.pairwise_match(a, b, mopts)
                    i1 = np.nonzero(res.matches_1_2 >= 0)[0]
                    return np.stack(
                        [i1, res.matches_1_2[i1]], axis=1).astype(np.int32) \
                        if len(i1) else np.zeros((0, 2), np.int32)
            matches = self.two_view_matching(viewports[a], viewports[b], rng,
                                             cascade_pair=cascade_pair)
            if matches is None:
                continue
            result.append(TwoViewMatching(a, b, matches))
            if opts.verbose:
                print(f"Pair ({a},{b}): {len(matches)} matches")
        return result
