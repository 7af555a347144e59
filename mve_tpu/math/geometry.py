"""Small geometric helpers (reference: libs/math/geometry.h, functions.h).

Vectorized over leading batch dims; numpy- and jax-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangle_normal(v0, v1, v2, normalize=True):
    """Normal of triangles (v1-v0) x (v2-v0). Batched (..., 3)."""
    n = jnp.cross(jnp.asarray(v1) - v0, jnp.asarray(v2) - v0)
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-32)
    return n


def triangle_area(v0, v1, v2):
    """Area of triangles. Batched (..., 3) -> (...)."""
    n = jnp.cross(jnp.asarray(v1) - v0, jnp.asarray(v2) - v0)
    return 0.5 * jnp.linalg.norm(n, axis=-1)


def triangle_circumradius(v0, v1, v2):
    """Circumradius r = abc / (4A) (reference geometry.h circumsphere)."""
    a = jnp.linalg.norm(jnp.asarray(v1) - v2, axis=-1)
    b = jnp.linalg.norm(jnp.asarray(v0) - v2, axis=-1)
    c = jnp.linalg.norm(jnp.asarray(v0) - v1, axis=-1)
    area = triangle_area(v0, v1, v2)
    return a * b * c / jnp.maximum(4.0 * area, 1e-32)


def normalize(v, axis=-1, eps=1e-32):
    v = jnp.asarray(v)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)
