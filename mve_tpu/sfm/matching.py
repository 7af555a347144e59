"""Feature matching with Lowe ratio + two-way consistency
(reference: libs/sfm/matching.h:22-146, matching.cc).

oneway_match -> twoway_match -> remove_inconsistent_matches semantics are
preserved exactly; the NN search itself runs on device as a batched
matmul (ops/matching.py) instead of the reference's per-query SSE loop.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..ops.matching import descriptor_top2


@dataclasses.dataclass
class MatchingOptions:
    """matching.h Options; defaults from matching_base.h:28-31 (SIFT)."""

    lowe_ratio_threshold: float = 0.8
    distance_threshold: float = float("inf")


@dataclasses.dataclass
class MatchingResult:
    """matching.h Result: per-element target index, -1 if unmatched."""

    matches_1_2: np.ndarray
    matches_2_1: np.ndarray


def _pad_rows(arr: np.ndarray, multiple: int = 256) -> np.ndarray:
    n = arr.shape[0]
    npad = max(multiple, (n + multiple - 1) // multiple * multiple)
    if npad == n:
        return arr
    return np.pad(arr, ((0, npad - n), (0, 0)))


def _pallas_mode() -> str:
    """'on' (TPU backend), 'interpret' (test override), or 'off'."""
    import os

    import jax

    if os.environ.get("MVE_TPU_FORCE_PALLAS_INTERPRET") == "1":
        return "interpret"
    return "on" if jax.default_backend() == "tpu" else "off"


def oneway_match(opts: MatchingOptions, set1: np.ndarray, set2: np.ndarray) -> np.ndarray:
    """Match each descriptor of set1 into set2 (matching.h:115-146)."""
    n1, n2 = len(set1), len(set2)
    if n1 == 0 or n2 == 0:
        return np.full(n1, -1, np.int32)
    mode = _pallas_mode()
    if mode != "off" and set1.shape[1] % 128 == 0:
        # Fused Pallas kernel: no (N1, N2) score matrix in HBM. Padded
        # reference rows are zero vectors (dot 0 -> dist 2), which can
        # only displace the 2nd best when fewer than 2 real refs exist.
        from ..ops.pallas_matching import descriptor_top2_pallas, TM, TN

        q = _pad_rows(np.asarray(set1, np.float32), TM)
        r = _pad_rows(np.asarray(set2, np.float32), TN)
        idx, d1, d2 = descriptor_top2_pallas(
            jnp.asarray(q), jnp.asarray(r), interpret=(mode == "interpret"))
        idx = np.where(np.asarray(idx)[:n1] < n2, np.asarray(idx)[:n1], -1)
        d1 = np.asarray(d1)[:n1]
        d2 = np.asarray(d2)[:n1]
        sq_lowe = opts.lowe_ratio_threshold**2
        sq_dist = opts.distance_threshold**2 if np.isfinite(opts.distance_threshold) else np.inf
        ok = (idx >= 0) & (d1 <= sq_dist) & (d1 / np.maximum(d2, 1e-30) <= sq_lowe)
        return np.where(ok, idx, -1).astype(np.int32)
    q = _pad_rows(np.asarray(set1, np.float32))
    r = _pad_rows(np.asarray(set2, np.float32))
    idx, d1, d2 = descriptor_top2(jnp.asarray(q), jnp.asarray(r), n_refs=n2)
    idx = np.asarray(idx)[:n1]
    d1 = np.asarray(d1)[:n1]
    d2 = np.asarray(d2)[:n1]
    sq_lowe = opts.lowe_ratio_threshold**2
    sq_dist = opts.distance_threshold**2 if np.isfinite(opts.distance_threshold) else np.inf
    ok = (d1 <= sq_dist) & (d1 / np.maximum(d2, 1e-30) <= sq_lowe)
    return np.where(ok, idx, -1).astype(np.int32)


def twoway_match(opts: MatchingOptions, set1: np.ndarray, set2: np.ndarray) -> MatchingResult:
    return MatchingResult(
        matches_1_2=oneway_match(opts, set1, set2),
        matches_2_1=oneway_match(opts, set2, set1),
    )


def remove_inconsistent_matches(result: MatchingResult) -> None:
    """Keep only mutual best matches (matching.cc remove_inconsistent)."""
    m12, m21 = result.matches_1_2, result.matches_2_1
    idx1 = np.arange(len(m12))
    ok12 = (m12 >= 0) & (m21[np.clip(m12, 0, max(len(m21) - 1, 0))] == idx1)
    result.matches_1_2 = np.where(ok12, m12, -1).astype(np.int32)
    idx2 = np.arange(len(m21))
    ok21 = (m21 >= 0) & (m12[np.clip(m21, 0, max(len(m12) - 1, 0))] == idx2)
    result.matches_2_1 = np.where(ok21, m21, -1).astype(np.int32)


def count_consistent_matches(result: MatchingResult) -> int:
    m12, m21 = result.matches_1_2, result.matches_2_1
    idx1 = np.arange(len(m12))
    valid = m12 >= 0
    return int(np.sum(valid & (m21[np.clip(m12, 0, max(len(m21) - 1, 0))] == idx1)))


def combine_results(sift_result: MatchingResult, surf_result: MatchingResult,
                    sift_offset_2: int, surf_offset_1: int, surf_offset_2: int) -> MatchingResult:
    """Concatenate SIFT and SURF matching results into one index space
    (matching.cc combine_results; SURF indices are shifted past SIFT)."""
    m12 = np.concatenate([
        np.where(sift_result.matches_1_2 >= 0, sift_result.matches_1_2, -1),
        np.where(surf_result.matches_1_2 >= 0, surf_result.matches_1_2 + sift_offset_2, -1),
    ]).astype(np.int32)
    m21 = np.concatenate([
        np.where(sift_result.matches_2_1 >= 0, sift_result.matches_2_1, -1),
        np.where(surf_result.matches_2_1 >= 0, surf_result.matches_2_1 + surf_offset_1, -1),
    ]).astype(np.int32)
    return MatchingResult(m12, m21)


def match_pair(set1: np.ndarray, set2: np.ndarray,
               opts: MatchingOptions = MatchingOptions()) -> np.ndarray:
    """Convenience: consistent matches as an (M, 2) index array."""
    result = twoway_match(opts, set1, set2)
    remove_inconsistent_matches(result)
    i1 = np.nonzero(result.matches_1_2 >= 0)[0]
    return np.stack([i1, result.matches_1_2[i1]], axis=1).astype(np.int32)
