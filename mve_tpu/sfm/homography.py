"""Homography estimation (reference: libs/sfm/homography.cc).

Batched DLT + symmetric transfer error for the RANSAC driver and for the
initial-pair "homography explained?" rejection test
(bundler_init_pair.cc:23).
"""

from __future__ import annotations

import jax.numpy as jnp


def homography_dlt(p1, p2):
    """Batched 4+ point DLT. p1, p2: (..., N, 2) -> H (..., 3, 3)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    # Two rows per correspondence (standard DLT for x2 ~ H x1).
    rows_a = jnp.stack([zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2], axis=-1)
    rows_b = jnp.stack([x1, y1, one, zero, zero, zero, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([rows_a, rows_b], axis=-2)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., -1, :]
    H = h.reshape(h.shape[:-1] + (3, 3))
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-30, 1e-30, H[..., 2:3, 2:3])


def symmetric_transfer_error(H, p1, p2):
    """0.5 * (|p2 - H p1|^2 + |p1 - H^-1 p2|^2) per correspondence
    (ransac_homography.cc evaluation)."""
    Hinv = jnp.linalg.inv(H)

    def transfer(H, p):
        x = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        y = jnp.einsum("...ij,...nj->...ni", H, x)
        return y[..., :2] / jnp.where(jnp.abs(y[..., 2:]) < 1e-30, 1e-30, y[..., 2:])

    e12 = jnp.sum((transfer(H, p1) - p2) ** 2, axis=-1)
    e21 = jnp.sum((transfer(Hinv, p2) - p1) ** 2, axis=-1)
    return 0.5 * (e12 + e21)
