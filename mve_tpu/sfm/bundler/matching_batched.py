"""All-pairs matching as a handful of device dispatches.

The per-pair path (matching.py) issues one NN matmul + one RANSAC batch
per view pair — fine on local hardware, latency-bound when dispatch
round-trips are expensive. This module stacks every pair into single
batched calls:

  1. descriptors padded per view to a common bucket -> (V, N, D) tensor
  2. one vmapped matmul+top2 over all pair indices -> mutual matches
  3. one vmapped 8-point RANSAC over all pairs -> inlier masks

Results are identical in semantics to the sequential path (same Lowe
ratio, two-way consistency, Sampson threshold); RANSAC sampling uses an
independent seed per pair.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import fundamental as fu
from .common import TwoViewMatching, Viewport
from .matching import MatchingOptions


_PAIR_CHUNK = 64  # pairs per dispatch: each pair's score matrix is
# (bucket x bucket) f32 (~16MB at 2048 descriptors); vmapping all
# O(V^2) pairs of a large scene at once exhausts HBM.


def _chunked_pairs(fn, arrays, n_pairs: int, chunk: int = _PAIR_CHUNK):
    """Apply `fn` to leading-axis chunks of `arrays`, padding every
    chunk (including a single short one) to the full chunk size (extra
    rows repeat row 0; their results are dropped). Bounds memory AND
    the compile count: any scene size runs through ONE compiled shape."""
    outs = []
    for i in range(0, max(n_pairs, 1), chunk):
        sub = [a[i:i + chunk] for a in arrays]
        n_real = len(sub[0])
        if n_real < chunk:
            sub = [np.concatenate([s] + [s[:1]] * (chunk - n_real))
                   for s in sub]
        outs.append(np.asarray(fn(*sub))[:n_real])
    return np.concatenate(outs)


@functools.partial(jax.jit, static_argnames=("lowe_sq",))
def _match_pairs_kernel(desc, n_desc, pair_a, pair_b, lowe_sq: float):
    """desc: (V, N, D); pair_a/b: (P,). Returns mutual-match target index
    per (pair, feature-of-a) with -1 for no match: (P, N)."""
    def one_pair(a, b):
        da = desc[a]  # (N, D)
        db = desc[b]
        na = n_desc[a]
        nb = n_desc[b]
        scores = jnp.dot(da, db.T, preferred_element_type=jnp.float32)
        N = scores.shape[0]
        col_ok = jnp.arange(N) < nb
        row_ok = jnp.arange(N) < na
        s = jnp.where(col_ok[None, :], scores, -jnp.inf)

        def top2(s_row):
            best = jnp.max(s_row, axis=-1)
            idx = jnp.argmax(s_row, axis=-1)
            s2 = jnp.where(jnp.arange(N)[None, :] == idx[:, None], -jnp.inf, s_row)
            second = jnp.max(s2, axis=-1)
            return idx, 2.0 - 2.0 * best, 2.0 - 2.0 * second

        i12, d12_1, d12_2 = top2(s)
        st = jnp.where(row_ok[None, :], scores.T, -jnp.inf)
        i21, d21_1, d21_2 = top2(st)
        ok12 = (d12_1 / jnp.maximum(d12_2, 1e-30) <= lowe_sq) & row_ok
        ok21 = (d21_1 / jnp.maximum(d21_2, 1e-30) <= lowe_sq) & col_ok
        m12 = jnp.where(ok12, i12, -1)
        m21 = jnp.where(ok21, i21, -1)
        # Two-way consistency.
        back = m21[jnp.clip(m12, 0, N - 1)]
        mutual = (m12 >= 0) & (back == jnp.arange(N))
        return jnp.where(mutual, m12, -1)

    return jax.vmap(one_pair)(pair_a, pair_b)


@functools.partial(jax.jit, static_argnames=("n_hyp", "threshold_sq"))
def _ransac_pairs_kernel(p1, p2, n_matches, sample_idx,
                         n_hyp: int, threshold_sq: float):
    """Batched RANSAC-F over pairs. p1/p2: (P, M, 2) padded matches;
    sample_idx: (P, n_hyp, 8). Returns inlier masks (P, M)."""
    def one_pair(pp1, pp2, nm, sidx):
        s1 = pp1[sidx]  # (H, 8, 2)
        s2 = pp2[sidx]
        F = fu.fundamental_8_point(s1, s2)  # (H, 3, 3)
        d = fu.sampson_distance(F, pp1[None], pp2[None])  # (H, M)
        valid_col = jnp.arange(pp1.shape[0]) < nm
        inl = (d < threshold_sq) & valid_col[None, :]
        counts = jnp.sum(inl, axis=1)
        best = jnp.argmax(counts)
        return inl[best]

    return jax.vmap(one_pair)(p1, p2, n_matches, sample_idx)


class BatchedMatching:
    """Drop-in alternative to bundler.Matching.compute for all-pairs mode."""

    def __init__(self, options: Optional[MatchingOptions] = None):
        self.opts = options or MatchingOptions()

    def compute(self, viewports: List[Viewport], seed: int = 0,
                pairs=None) -> List[TwoViewMatching]:
        """pairs: optional explicit (v2, v1) list — the multi-process
        path shards the full pair list across hosts (multihost.my_shard)
        and each process matches only its share."""
        opts = self.opts
        V = len(viewports)
        rng = np.random.RandomState(seed)
        if pairs is None:
            pairs = []
            for v1 in range(V):
                for v2 in range(v1):
                    if opts.max_num_pairs_per_view > 0 and v1 - v2 > opts.max_num_pairs_per_view:
                        continue
                    pairs.append((v2, v1))
        if not pairs:
            return []

        # --- stage 1: batched NN matching over all pairs
        nmax = max(max((len(vp.descriptors) for vp in viewports), default=1), 1)
        bucket = max(256, (nmax + 255) // 256 * 256)
        desc = np.zeros((V, bucket, 128), np.float32)
        n_desc = np.zeros(V, np.int32)
        for i, vp in enumerate(viewports):
            n = len(vp.descriptors)
            desc[i, :n] = vp.descriptors
            n_desc[i] = n
        pair_a = np.array([a for a, _ in pairs], np.int32)
        pair_b = np.array([b for _, b in pairs], np.int32)
        lowe_sq = opts.lowe_ratio ** 2

        if opts.use_lowres_matching:
            # Low-res prefilter (bundler_matching.cc low-res pass): match
            # only the first num_lowres_features descriptors of every
            # pair in ONE batched dispatch; pairs under
            # min_lowres_matches are rejected before the full pass.
            nl = opts.num_lowres_features
            lb = max(256, (min(nl, desc.shape[1]) + 255) // 256 * 256)
            n_lr = np.minimum(n_desc, nl).astype(np.int32)
            d_lr = jnp.asarray(desc[:, :lb])
            d_nlr = jnp.asarray(n_lr)
            m_lr = _chunked_pairs(
                lambda pa, pb: _match_pairs_kernel(
                    d_lr, d_nlr, jnp.asarray(pa), jnp.asarray(pb), lowe_sq),
                (pair_a, pair_b), len(pair_a))
            counts = (m_lr >= 0).sum(axis=1)
            sel = np.nonzero(counts >= opts.min_lowres_matches)[0]
            if opts.verbose and len(sel) < len(pairs):
                print(f"Low-res matching rejected "
                      f"{len(pairs) - len(sel)} of {len(pairs)} pairs.")
            pairs = [pairs[k] for k in sel]
            if not pairs:
                return []
            pair_a = pair_a[sel]
            pair_b = pair_b[sel]

        d_full = jnp.asarray(desc)
        d_n = jnp.asarray(n_desc)
        m12 = _chunked_pairs(
            lambda pa, pb: _match_pairs_kernel(
                d_full, d_n, jnp.asarray(pa), jnp.asarray(pb), lowe_sq),
            (pair_a, pair_b), len(pair_a))

        # SURF blocks matched separately and merged with offsets.
        surf_sizes = [len(vp.surf_descriptors) for vp in viewports]
        m12_surf = None
        if any(surf_sizes):
            smax = max(max(surf_sizes), 1)
            sbucket = max(256, (smax + 255) // 256 * 256)
            sdesc = np.zeros((V, sbucket, 64), np.float32)
            sn = np.zeros(V, np.int32)
            for i, vp in enumerate(viewports):
                n = len(vp.surf_descriptors)
                sdesc[i, :n] = vp.surf_descriptors
                sn[i] = n
            sd_full = jnp.asarray(sdesc)
            sd_n = jnp.asarray(sn)
            m12_surf = _chunked_pairs(
                lambda pa, pb: _match_pairs_kernel(
                    sd_full, sd_n, jnp.asarray(pa), jnp.asarray(pb),
                    0.7 ** 2),
                (pair_a, pair_b), len(pair_a))

        # --- collect raw matches per pair (host)
        raw = []
        for k, (a, b) in enumerate(pairs):
            row = m12[k][: n_desc[a]]
            i1 = np.nonzero(row >= 0)[0]
            matches = np.stack([i1, row[i1]], axis=1).astype(np.int32)
            if m12_surf is not None and surf_sizes[a] and surf_sizes[b]:
                srow = m12_surf[k][: surf_sizes[a]]
                si = np.nonzero(srow >= 0)[0]
                if len(si):
                    sm = np.stack([si + viewports[a].num_sift,
                                   srow[si] + viewports[b].num_sift], axis=1)
                    matches = np.concatenate([matches, sm.astype(np.int32)])
            raw.append(matches)

        keep = [k for k in range(len(pairs)) if len(raw[k]) >= opts.min_feature_matches]
        if not keep:
            return []

        # --- stage 2: batched geometric verification
        M = max(max(len(raw[k]) for k in keep), 8)
        Mpad = (M + 63) // 64 * 64
        P = len(keep)
        H = opts.ransac_opts.max_iterations
        p1 = np.zeros((P, Mpad, 2), np.float32)
        p2 = np.zeros((P, Mpad, 2), np.float32)
        nm = np.zeros(P, np.int32)
        sample_idx = np.zeros((P, H, 8), np.int32)
        for j, k in enumerate(keep):
            a, b = pairs[k]
            m = raw[k]
            p1[j, : len(m)] = viewports[a].positions[m[:, 0]]
            p2[j, : len(m)] = viewports[b].positions[m[:, 1]]
            nm[j] = len(m)
            # Unique 8-subsets per hypothesis via random-key argpartition.
            sample_idx[j] = np.argpartition(
                rng.rand(H, len(m)), 8, axis=1)[:, :8]
        inl = _chunked_pairs(
            lambda a1, a2, an, asi: _ransac_pairs_kernel(
                jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(an),
                jnp.asarray(asi), H, opts.ransac_opts.threshold ** 2),
            (p1, p2, nm, sample_idx), P)

        result = []
        for j, k in enumerate(keep):
            a, b = pairs[k]
            mask = inl[j][: nm[j]]
            if int(mask.sum()) < opts.min_matching_inliers:
                continue
            result.append(TwoViewMatching(a, b, raw[k][mask]))
            if opts.verbose:
                print(f"Pair ({a},{b}): {int(mask.sum())} matches")
        return result
