"""Cascade hashing + 7-point solver tests."""

import numpy as np
import jax.numpy as jnp

from mve_tpu.sfm.cascade_hashing import CascadeHashing
from mve_tpu.sfm.matching import MatchingOptions, match_pair
from mve_tpu.sfm import fundamental as fu

from tests.test_geometry import _synthetic_pair


def _descriptor_sets(n=200, seed=0):
    """Two descriptor sets where set2 = permuted noisy copies of set1."""
    rng = np.random.RandomState(seed)
    d1 = rng.randn(n, 128).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    perm = rng.permutation(n)
    d2 = d1[perm] + rng.randn(n, 128).astype(np.float32) * 0.05
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    return d1, d2, perm


def test_cascade_hashing_agrees_with_exhaustive():
    d1, d2, perm = _descriptor_sets()
    ch = CascadeHashing()
    ch.init([d1, d2])
    result = ch.pairwise_match(0, 1, MatchingOptions(lowe_ratio_threshold=0.8))
    got = result.matches_1_2
    # Ground truth: descriptor i of set1 matches perm^{-1}[...] position.
    inv = np.argsort(perm)
    correct = (got == inv).mean()
    assert correct > 0.9, f"only {correct:.2f} correct"
    # And close to what exhaustive matching finds.
    exact_pairs = match_pair(d1, d2, MatchingOptions(lowe_ratio_threshold=0.8))
    exact_map = np.full(len(d1), -1, np.int64)
    exact_map[exact_pairs[:, 0]] = exact_pairs[:, 1]
    agree = (got[exact_map >= 0] == exact_map[exact_map >= 0]).mean()
    assert agree > 0.95


def test_seven_point():
    X, p1, p2, pose1, pose2 = _synthetic_pair(7)
    Fs, valid = fu.fundamental_7_point(jnp.asarray(p1, jnp.float32)[None],
                                       jnp.asarray(p2, jnp.float32)[None])
    Fs = np.asarray(Fs)[0]
    valid = np.asarray(valid)[0]
    assert valid.any()
    h1 = np.concatenate([p1, np.ones((7, 1))], 1)
    h2 = np.concatenate([p2, np.ones((7, 1))], 1)
    best = np.inf
    for i in range(3):
        if not valid[i]:
            continue
        F = Fs[i] / max(np.abs(Fs[i]).max(), 1e-30)
        resid = np.abs(np.einsum("ni,ij,nj->n", h2, F, h1)).max()
        best = min(best, resid)
    assert best < 1e-4
