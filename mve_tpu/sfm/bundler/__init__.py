"""Incremental SfM pipeline components (reference: libs/sfm/bundler_*).

Host-side state machine orchestrating device kernels: feature detection
(sift.py), pairwise matching (matching.py + RANSAC-F), track building,
initial pair selection, P3P resectioning and bundle adjustment (ba/).
"""

from .common import (
    Viewport, Track, FeatureReference, TwoViewMatching,
    save_prebundle, load_prebundle, undistort_feature)
from .features import Features, FeaturesOptions
from .matching import Matching, MatchingOptions as BundlerMatchingOptions
from .tracks import Tracks, TracksOptions
from .init_pair import InitialPair, InitialPairOptions
from .intrinsics import Intrinsics, IntrinsicsOptions
from .incremental import Incremental, IncrementalOptions

__all__ = [
    "Viewport", "Track", "FeatureReference", "TwoViewMatching",
    "save_prebundle", "load_prebundle", "undistort_feature",
    "Features", "FeaturesOptions",
    "Matching", "BundlerMatchingOptions",
    "Tracks", "TracksOptions",
    "InitialPair", "InitialPairOptions",
    "Intrinsics", "IntrinsicsOptions",
    "Incremental", "IncrementalOptions",
]
