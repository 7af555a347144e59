"""Core data plane: scene/view/camera/bundle/image/mesh (reference: libs/mve/).

On-disk contracts match the reference so the two frameworks interoperate on
the same scene directories: `views/view_NNNN.mve/` dirs with `meta.ini` +
embeddings, `synth_0.out` bundles, MVEI images, PLY meshes
(reference: libs/mve/view.h:9-37, scene.h:34-100, bundle_io.cc).
"""

from .camera import CameraInfo
from .mesh import TriangleMesh
from .view import View
from .scene import Scene
from .bundle import Bundle, Feature2D, Feature3D

__all__ = [
    "CameraInfo",
    "TriangleMesh",
    "View",
    "Scene",
    "Bundle",
    "Feature2D",
    "Feature3D",
]
