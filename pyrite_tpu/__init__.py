"""pyrite-tpu: a TPU-native spectral path-tracing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of Ogeon/pyrite
(reference mounted at /root/reference): wavelength-based light transport over
wavefronts of rays sharded across TPU meshes.
"""

import jax as _jax

# Ray tracing needs full f32 precision in its (tiny) matrix products — camera
# transforms, frame rotations, colorimetric integration. TPU matmuls default
# to bf16 inputs, which quantizes ray directions into visible banding. The
# MXU-heavy kernels opt into lower precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"
