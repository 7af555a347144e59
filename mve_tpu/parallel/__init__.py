"""Device meshes and distributed execution (SURVEY.md §2.9 TPU-native
equivalents).

The reference is a single-node OpenMP codebase; its scale-out story is
"run apps per view on shared storage". Here the distribution axes are:

- observations for bundle adjustment: shard the (O, ...) tensors across
  the mesh; every segment-sum in the Schur solve becomes a psum over ICI
  (the one latency-critical collective, per BASELINE.json).
- views for feature detection / matching / MVS: embarrassingly parallel,
  sharded by view or pair id.
"""

from .mesh import get_mesh, shard_batch, replicate
from .distributed_ba import distributed_ba_step

__all__ = ["get_mesh", "shard_batch", "replicate", "distributed_ba_step"]
