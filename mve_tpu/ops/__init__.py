"""Device kernels (XLA + Pallas) for the hot compute paths.

The reference's SSE hot loops (descriptor NN, NCC patch sampling) become
MXU-shaped batched kernels here. Each op has a pure-XLA reference
implementation and, where it pays, a Pallas TPU kernel selected at call
time on TPU backends.
"""

from .matching import descriptor_top2

__all__ = ["descriptor_top2"]
