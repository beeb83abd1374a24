"""reconstructor_tpu — a TPU-native incremental Structure-from-Motion engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``smileyenot983/reconstructor`` (C++/OpenCV/libTorch/Ceres/PCL reference,
mounted read-only at /root/reference). Nothing here is a port: the compute
path is organized around batched, fixed-shape array programs that map onto
the TPU MXU/VPU, with multi-chip scaling expressed via ``jax.sharding``
meshes and XLA collectives rather than threads.

Layer map (mirrors SURVEY.md §1 capability-wise, not structurally):

- ``geometry``  — SE(3), pinhole camera (reference Camera.h parity),
                  triangulation, epipolar estimation, RANSAC, PnP.
- ``features``  — classic DoG/SIFT-style detector and SuperPoint, batched.
- ``matching``  — exact top-2 kNN (FLANN replacement), SuperGlue/Sinkhorn,
                  sharded all-pairs matching.
- ``ba``        — Levenberg-Marquardt bundle adjustment with Schur
                  complement; single-chip and mesh-distributed versions.
- ``pipeline``  — the incremental reconstruction driver
                  (SequentialReconstructor equivalent).
- ``io``        — image reading/resizing, PLY export.
- ``utils``     — timing, config plumbing.
"""

import jax as _jax

# Geometry (RANSAC, DLT, Schur solves) needs true f32 matmuls; the TPU MXU
# default of bfloat16 accumulation silently destroys pose accuracy. Hot NN
# kernels opt back into bf16 explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "float32")

from reconstructor_tpu.config import ReconstructorConfig

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy convenience export: `from reconstructor_tpu import
    # IncrementalReconstructor` without paying pipeline import cost for
    # users who only need the config or a submodule.
    if name == "IncrementalReconstructor":
        from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor
        return IncrementalReconstructor
    raise AttributeError(name)


__all__ = ["ReconstructorConfig", "IncrementalReconstructor", "__version__"]
