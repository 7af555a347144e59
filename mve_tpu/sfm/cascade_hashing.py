"""Cascade-hashing matcher (reference: libs/sfm/cascade_hashing.h:29-219).

The reference's LSH cascade exists to beat the CPU cost of exhaustive NN:
128-bit primary hashes from random projections of zero-mean descriptors,
secondary bucket hashes for candidate collection, top-k by hamming
distance, exact NN on the candidates.

TPU recast: descriptors hash through one matmul + sign; hamming distances
compute as XOR + population_count over packed uint32 lanes (the VPU's
version of the SSE popcount loop); the top-k candidate set then gets
exact dot products. Same three-stage semantics, no per-bucket pointer
chasing. For moderate set sizes the plain MXU matmul (ops/matching.py)
is usually faster — this matcher exists for very large descriptor sets
and for reference parity.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .matching import MatchingOptions, MatchingResult, remove_inconsistent_matches


@dataclasses.dataclass
class CascadeHashingOptions:
    num_hash_bits: int = 128
    num_candidates: int = 10  # top-k by hamming for exact re-ranking
    seed: int = 0


class CascadeHashing:
    """Mirrors sfm::CascadeHashing (init + pairwise_match API)."""

    def __init__(self, options: CascadeHashingOptions | None = None,
                 dim: int = 128):
        self.opts = options or CascadeHashingOptions()
        rng = np.random.RandomState(self.opts.seed)
        # Random projections for the primary hash (cascade_hashing.h:86).
        self.proj = rng.randn(dim, self.opts.num_hash_bits).astype(np.float32)
        self._codes = {}
        self._descs = {}
        self._mean = None

    def init(self, descriptor_sets):
        """Precompute packed hash codes for all sets (zero-mean
        projections, cascade_hashing.h init)."""
        all_desc = np.concatenate([d for d in descriptor_sets if len(d)], axis=0)
        self._mean = all_desc.mean(axis=0).astype(np.float32)
        for i, d in enumerate(descriptor_sets):
            self._descs[i] = np.asarray(d, np.float32)
            self._codes[i] = np.asarray(_hash_codes(
                jnp.asarray(self._descs[i]), jnp.asarray(self.proj),
                jnp.asarray(self._mean)))

    def pairwise_match(self, id1: int, id2: int,
                       opts: MatchingOptions = MatchingOptions()) -> MatchingResult:
        d1, d2 = self._descs[id1], self._descs[id2]
        c1, c2 = self._codes[id1], self._codes[id2]
        m12 = self._oneway(d1, c1, d2, c2, opts)
        m21 = self._oneway(d2, c2, d1, c1, opts)
        result = MatchingResult(m12, m21)
        remove_inconsistent_matches(result)
        return result

    def _oneway(self, d1, c1, d2, c2, opts) -> np.ndarray:
        n1, n2 = len(d1), len(d2)
        if n1 == 0 or n2 == 0:
            return np.full(n1, -1, np.int32)
        k = min(self.opts.num_candidates, n2)
        idx, dist1, dist2 = _cascade_oneway(
            jnp.asarray(d1), jnp.asarray(c1), jnp.asarray(d2), jnp.asarray(c2), k)
        idx = np.asarray(idx)
        dist1 = np.asarray(dist1)
        dist2 = np.asarray(dist2)
        sq_lowe = opts.lowe_ratio_threshold**2
        ok = dist1 / np.maximum(dist2, 1e-30) <= sq_lowe
        if np.isfinite(opts.distance_threshold):
            ok &= dist1 <= opts.distance_threshold**2
        return np.where(ok, idx, -1).astype(np.int32)


@jax.jit
def _hash_codes(descs, proj, mean):
    """(N, D) float descriptors -> (N, B/32) packed uint32 sign codes."""
    z = (descs - mean) @ proj  # (N, B)
    bits = (z > 0).astype(jnp.uint32)
    B = bits.shape[1]
    packed = bits.reshape(-1, B // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(packed * weights[None, None, :], axis=-1)


@functools.partial(jax.jit, static_argnames=("k",))
def _cascade_oneway(d1, c1, d2, c2, k: int):
    """Hamming top-k candidates then exact NN re-ranking."""
    # Hamming distance matrix via XOR + popcount: (N1, N2).
    x = c1[:, None, :] ^ c2[None, :, :]
    ham = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    # top-k smallest hamming -> candidate indices (N1, k).
    _, cand = jax.lax.top_k(-ham, k)
    # Exact dot products on candidates only.
    gathered = d2[cand]  # (N1, k, D)
    dots = jnp.einsum("nd,nkd->nk", d1, gathered)
    dist = 2.0 - 2.0 * dots
    order = jnp.argsort(dist, axis=1)
    best = jnp.take_along_axis(cand, order[:, :1], axis=1)[:, 0]
    d_best = jnp.take_along_axis(dist, order[:, :1], axis=1)[:, 0]
    d_second = jnp.take_along_axis(dist, order[:, 1:2], axis=1)[:, 0] if k > 1 else jnp.full_like(d_best, jnp.inf)
    return best.astype(jnp.int32), d_best, d_second
