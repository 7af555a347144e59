"""Structure-from-Motion: features, matching, robust geometry, incremental
SfM and bundle adjustment (reference: libs/sfm/).

Device design (TPU-first, SURVEY.md §7 stages 1-3):

- SIFT/SURF as dense jitted pyramid pipelines + batched keypoint kernels.
- Matching as tiled descriptor matmuls on the MXU (ops/matching.py).
- RANSAC as fixed-batch vmapped hypothesis solvers.
- Bundle adjustment as batched residual/Jacobian evaluation with a
  segment-sum Schur-complement PCG solver.
"""
