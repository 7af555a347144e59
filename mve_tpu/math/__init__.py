"""Geometry and linear-algebra helpers (reference: libs/math/).

The reference implements fixed-size Vector/Matrix classes, SVD/QR, rotation
utilities, quaternions and intersection predicates in ~6k LoC of C++
(SURVEY.md §2.2). On TPU all of that collapses onto jnp arrays + XLA's
batched linalg; this package keeps only the pieces with real logic:
rotation parameterizations, intersection predicates and small solvers, all
written to be jit/vmap-compatible (works on numpy or jax arrays).
"""

from . import rotation
from . import geometry
from . import intersect

__all__ = ["rotation", "geometry", "intersect"]
