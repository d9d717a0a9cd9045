"""sfm_mvs_pipeline_tpu — a TPU-native Structure-from-Motion + Multi-View-Stereo framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
C++ photogrammetry pipeline (brunothg/sfm-mvs-pipeline): sparse SfM (feature
detection -> matching -> incremental pose recovery -> triangulation -> bundle
adjustment) followed by dense MVS (plane-sweep/SGM depth maps, fusion,
meshing, texturing), plus the CLI, statistics and PLY-export tooling around it.

Design stance (not a port):
  * flat fixed-capacity SoA arrays + validity masks instead of the reference's
    mutable pointer-graph `Scene` (ref: src/photogrammetrie/common/Scene.h:35-510)
  * every stage a jit-able batched op; Pallas kernels on the hot paths
    (descriptor distances, SGM aggregation, BA block assembly)
  * scaling via jax.sharding NamedSharding/shard_map over a device Mesh
    instead of OpenMP `parallel for` (ref: src/cli/App.cpp:42-45)
"""

import jax as _jax

# Geometry code (DLT systems, normal equations, homography warps) needs full
# f32 matmuls: the TPU MXU's default bf16 input precision silently destroys
# RANSAC/DLT conditioning (observed: essential/PnP inlier ratios collapsing
# from ~0.6 to ~0.01 on hardware). Kernels that *want* reduced precision
# opt in explicitly (e.g. the Pallas matcher controls its own dot types).
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

APP_NAME = "sfm-mvs-pipeline-tpu"
APP_VERSION = __version__
