"""Bundle adjustment (reference: libs/sfm/bundle_adjustment.*,
ba_linear_solver.*, ba_conjugate_gradient.h, ba_sparse_matrix.h).

TPU-native architecture: the reference's CSC sparse matrices disappear
entirely. Per-observation residuals and Jacobian blocks are batched
(autodiff) tensors; Hessian blocks B (9x9/camera), C (3x3/point) and the
E couplings are formed with segment-sums; the Schur-complement reduced
camera system is solved matrix-free with preconditioned CG where each
S*y product is two batched einsums + two segment-sums. The LM trust
region dynamics replicate the reference exactly (gain-ratio rule,
multiplicative diagonal damping 1 + 1/trust_region_radius).

Sharding: observations are the data axis — shard them across devices and
every segment-sum turns into a psum over ICI; cameras/points stay
replicated (SURVEY.md §2.9 TPU-native equivalents).
"""

from .problem import BAProblem, BACamera, BAPoint, BAObservation, BundleMode
from .lm import BundleAdjustment, BAOptions, BAStatus

__all__ = [
    "BAProblem", "BACamera", "BAPoint", "BAObservation", "BundleMode",
    "BundleAdjustment", "BAOptions", "BAStatus",
]
