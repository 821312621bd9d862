"""vdo_slam_tpu — a TPU-native dynamic-object-aware SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the C++
reference VDO-SLAM (halajun/VDO_SLAM): per-frame camera pose, per-object
SE(3) rigid motions, static/dynamic structure, object velocities, and
windowed/full-batch factor-graph refinement — redesigned as pure-functional
pipelines over fixed-shape padded tensors.
"""

import jax as _jax

# SLAM geometry needs true fp32 matmuls: on TPU the default matmul precision
# is bfloat16 passes, which injects ~1e-3 error into 3x3/4x4 pose algebra and
# destroys solver convergence.  Hot kernels that tolerate bf16 opt back in
# locally via explicit precision arguments.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import VDOConfig, load_settings  # noqa: E402

__version__ = "0.1.0"
__all__ = ["VDOConfig", "load_settings", "__version__"]
