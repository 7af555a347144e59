"""Batched all-pairs matching must agree with the sequential matcher."""

import numpy as np

from mve_tpu.sfm.bundler import Matching, BundlerMatchingOptions, Viewport
from mve_tpu.sfm.bundler.matching_batched import BatchedMatching
from mve_tpu.sfm.ransac import RansacOptions


def _viewports(n_views=4, n_pts=150, seed=0, noise=0.02):
    """Shared synthetic 'world descriptors' observed by several views."""
    rng = np.random.RandomState(seed)
    world = rng.randn(n_pts, 128).astype(np.float32)
    world /= np.linalg.norm(world, axis=1, keepdims=True)
    world_xy = rng.rand(n_pts, 2).astype(np.float32) - 0.5
    vps = []
    for v in range(n_views):
        sel = rng.rand(n_pts) < 0.8
        ids = np.nonzero(sel)[0]
        rng.shuffle(ids)
        d = world[ids] + rng.randn(len(ids), 128).astype(np.float32) * noise
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        vp = Viewport()
        vp.descriptors = d
        vp.num_sift = len(d)
        # positions: projective-ish offset per view keeps F-RANSAC happy
        vp.positions = (world_xy[ids] + 0.01 * v + rng.randn(len(ids), 2) * 1e-4).astype(np.float32)
        vp.colors = np.full((len(d), 3), 100, np.uint8)
        vp.track_ids = np.full(len(d), -1, np.int32)
        vps.append(vp)
    return vps


def test_batched_matches_sequential():
    vps = _viewports()
    opts = BundlerMatchingOptions(
        ransac_opts=RansacOptions(max_iterations=256, threshold=0.01))
    seq = Matching(opts).compute(vps, seed=0)
    bat = BatchedMatching(opts).compute(vps, seed=0)
    seq_pairs = {(m.view_1_id, m.view_2_id): m.matches for m in seq}
    bat_pairs = {(m.view_1_id, m.view_2_id): m.matches for m in bat}
    assert set(seq_pairs) == set(bat_pairs)
    for key in seq_pairs:
        s = set(map(tuple, seq_pairs[key]))
        b = set(map(tuple, bat_pairs[key]))
        # RANSAC sampling differs; the mutual-NN candidate sets must agree
        # almost entirely and inlier sets overlap strongly.
        overlap = len(s & b) / max(len(s | b), 1)
        assert overlap > 0.9, f"pair {key}: overlap {overlap:.2f}"


def test_cascade_hashing_matcher_selection():
    """bundler.Matching with use_cascade_hashing finds (nearly) the same
    verified pairs as the exhaustive path (sfmrecon.cc:141-153 matcher
    selection wired through BundlerMatchingOptions)."""
    vps = _viewports()
    opts = BundlerMatchingOptions(
        ransac_opts=RansacOptions(max_iterations=256, threshold=0.01))
    exh = Matching(opts).compute(vps, seed=0)
    import dataclasses
    copts = dataclasses.replace(opts, use_cascade_hashing=True)
    cas = Matching(copts).compute(vps, seed=0)
    exh_pairs = {(m.view_1_id, m.view_2_id): m.matches for m in exh}
    cas_pairs = {(m.view_1_id, m.view_2_id): m.matches for m in cas}
    assert set(cas_pairs) == set(exh_pairs)
    for key in exh_pairs:
        s = set(map(tuple, exh_pairs[key]))
        c = set(map(tuple, cas_pairs[key]))
        overlap = len(s & c) / max(len(s | c), 1)
        # The LSH cascade re-ranks top-10 hamming candidates exactly; on
        # well-separated descriptors it recovers almost all exhaustive
        # matches.
        assert overlap > 0.8, f"pair {key}: overlap {overlap:.2f}"
