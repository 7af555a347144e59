"""Intersection predicates (reference: libs/math/octree_tools.h:47-93).

Ray/box, ray/triangle, point/box tests used by FSSR octree queries and
dmrecon AABB filtering. Vectorized, numpy/jax compatible.
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_box(origin, direction, box_min, box_max):
    """Slab-test ray/AABB intersection. Returns (hit, tmin, tmax).

    Batched over leading dims of origin/direction; box is (..., 3) or (3,).
    Matches behavior of octree_tools.h:52 ray_box_overlap.
    """
    origin = jnp.asarray(origin)
    direction = jnp.asarray(direction)
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-32, jnp.where(direction < 0, -1e-32, 1e-32), direction)
    t0 = (jnp.asarray(box_min) - origin) * inv
    t1 = (jnp.asarray(box_max) - origin) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    return hit, tmin, tmax


def ray_triangle(origin, direction, v0, v1, v2, eps=1e-12):
    """Moeller-Trumbore ray/triangle test. Returns (hit, t, u, v).

    Matches behavior of octree_tools.h:63 ray_triangle_intersect.
    """
    origin = jnp.asarray(origin)
    direction = jnp.asarray(direction)
    e1 = jnp.asarray(v1) - v0
    e2 = jnp.asarray(v2) - v0
    p = jnp.cross(direction, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    tvec = origin - v0
    u = jnp.sum(tvec * p, axis=-1) * inv_det
    q = jnp.cross(tvec, e1)
    v = jnp.sum(direction * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    hit = (jnp.abs(det) >= eps) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
    return hit, t, u, v


def point_in_box(p, box_min, box_max):
    """Inclusive point/AABB containment (octree_tools.h:92)."""
    p = jnp.asarray(p)
    return jnp.all((p >= jnp.asarray(box_min)) & (p <= jnp.asarray(box_max)), axis=-1)
