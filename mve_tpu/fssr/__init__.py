"""Floating-Scale Surface Reconstruction (reference: libs/fssr/).

Fuhrmann & Goesele FSSR: each point sample {pos, normal, scale,
confidence, color} contributes a scale-adaptive signed basis function
(Gaussian derivative along the normal) and a compactly-supported weight;
the implicit function is their confidence-weighted quotient, and the
surface is the zero level set.

TPU-native split: sample bucketing and voxel/sample influence pairing on
host (vectorized numpy grid hashing), implicit-function evaluation as one
batched device segment-sum over influence pairs (replacing the OpenMP
voxel loop at iso_octree.cc:73), iso-surface extraction on host.

Round-1 extraction uses a uniform sparse voxel grid at a resolution
derived from the sample scale distribution with marching-tetrahedra
polygonization; the reference's fully scale-adaptive octree extraction
(iso_surface.cc) is planned for a later round.
"""

from .sample import Sample, SampleList, samples_from_mesh, load_samples_from_ply
from .iso_octree import IsoOctree
from .iso_surface import IsoSurface
from .mesh_clean import clean_mc_mesh, clean_needles, clean_caps

__all__ = [
    "Sample", "SampleList", "samples_from_mesh", "load_samples_from_ply",
    "IsoOctree", "IsoSurface",
    "clean_mc_mesh", "clean_needles", "clean_caps",
]
