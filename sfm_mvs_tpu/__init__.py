"""sfm_mvs_tpu — a TPU-native incremental Structure-from-Motion framework.

Built from scratch on JAX/XLA/Pallas/pjit with the capabilities of the
reference pipeline FlagArihant2000/sfm-mvs (see SURVEY.md): SIFT-style
feature detection, brute-force KNN matching with Lowe-ratio filtering,
essential-matrix RANSAC, SVD pose recovery, PnP camera registration, DLT
triangulation, and sparse-Schur Levenberg-Marquardt bundle adjustment —
all as fixed-capacity, masked, batched, jit-compatible computations.

Subpackages
-----------
ops       Geometry + vision kernels (pure jitted JAX / Pallas).
models    Pipeline state and drivers (two-view bootstrap, incremental SfM,
          track-based global SfM, bundle adjustment).
parallel  Device-mesh sharding: data-parallel front end, distributed BA.
utils     Host-side IO (images, PLY, pose.csv), config, metrics, synthetic
          scene generation, checkpointing.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry code needs genuine float32 matmuls. TPU's default matmul
# precision routes f32 through one bf16 MXU pass (8-bit mantissa), which
# corrupts residuals/Jacobians enough to stall bundle adjustment (measured:
# LM plateaus at ~1.4px^2 instead of 1e-9 on a noiseless problem) and
# skews every pose solve. Hot kernels that tolerate bf16 (descriptor
# distance matmuls) opt back in explicitly with `precision=` arguments.
_jax.config.update("jax_default_matmul_precision", "highest")

from sfm_mvs_tpu.utils.config import SfmConfig  # noqa: F401
