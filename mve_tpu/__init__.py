"""mve_tpu — a TPU-native multi-view 3D reconstruction framework.

A ground-up reimplementation of the capabilities of the Multi-View
Environment (MVE, simonfuhrmann/mve): Structure-from-Motion, Multi-View
Stereo, depth-map fusion and Floating-Scale Surface Reconstruction —
designed for TPU hardware with JAX / XLA / Pallas as the compute path.

Layer map (mirrors the reference's libs/, see SURVEY.md §1):

    mve_tpu.utils     — host services (CLI args, logging, timers, INI)
    mve_tpu.math      — geometry/linear-algebra helpers on top of jnp
    mve_tpu.core      — scene/view/camera/bundle/image/mesh data plane
    mve_tpu.ops       — Pallas TPU kernels (matching, NCC, convolution)
    mve_tpu.sfm       — features, matching, robust geometry, incremental
                        SfM, Levenberg-Marquardt bundle adjustment
    mve_tpu.mvs       — per-view depth maps via batched plane-sweep +
                        Gauss-Newton patch refinement
    mve_tpu.fssr      — floating-scale surface reconstruction
    mve_tpu.parallel  — device meshes, sharded/distributed execution
    mve_tpu.apps      — CLI tools mirroring the reference apps
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Optional platform override (e.g. MVE_TPU_PLATFORM=cpu to keep small CLI
# jobs off the TPU). Honored here because some environments force-register
# a TPU platform in sitecustomize, overriding JAX_PLATFORMS before user
# code runs; updating the config after import is the reliable hook.
if _os.environ.get("MVE_TPU_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["MVE_TPU_PLATFORM"])

# Geometry code (rotations, epipolar solvers, triangulation, BA) needs full
# float32 matmuls; on TPU the default MXU precision is bfloat16, which is
# catastrophic for pose accuracy. Throughput-critical kernels (descriptor
# matching, NCC) opt back in to lower precision explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")
