"""Descriptor nearest-neighbor ops (reference: libs/sfm/nearest_neighbor.cc).

The reference's SSE int16 inner-product loops become one batched matmul on
the MXU: scores = Q @ R^T, with a fused top-2 reduction. For unit-length
descriptors the squared L2 distance is 2 - 2*dot (nearest_neighbor.h:20-45
documents the same max-inner-product formulation).

The Pallas kernel tiles the (N1, N2) score matrix so it never materializes
in HBM: each grid step computes a (TM, 128) x (128, TN) block in VMEM and
folds it into per-row running (best, second-best) pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("use_bf16",))
def descriptor_top2(query, refs, n_query=None, n_refs=None, use_bf16: bool = False):
    """Top-2 nearest neighbors by max inner product.

    query: (N1, D), refs: (N2, D), rows beyond n_query/n_refs are padding.
    Returns (idx1, dist1, dist2): best index, squared L2 distances of best
    and 2nd best (unit-descriptor convention dist^2 = 2 - 2 dot).
    """
    N1, D = query.shape
    N2 = refs.shape[0]
    if use_bf16:
        scores = jnp.dot(
            query.astype(jnp.bfloat16), refs.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32)
    else:
        scores = jnp.dot(query, refs.T, preferred_element_type=jnp.float32)
    if n_refs is not None:
        col_ok = jnp.arange(N2) < n_refs
        scores = jnp.where(col_ok[None, :], scores, -jnp.inf)
    # Top-2 max per row.
    best = jnp.max(scores, axis=1)
    idx1 = jnp.argmax(scores, axis=1)
    scores2 = jnp.where(jnp.arange(N2)[None, :] == idx1[:, None], -jnp.inf, scores)
    second = jnp.max(scores2, axis=1)
    dist1 = 2.0 - 2.0 * best
    dist2 = 2.0 - 2.0 * second
    return idx1.astype(jnp.int32), dist1, dist2
