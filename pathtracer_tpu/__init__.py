"""pathtracer_tpu — a TPU-native spectral physically-based renderer.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
gillett-hernandez/rust-pathtracer (a CPU, thread-parallel, wavelength-aware
path tracer): spectral light transport (PT / LT / BDPT), GGX + Lambertian
BSDFs with dispersion, participating media, environment importance sampling,
CIE-XYZ film and EXR/PNG output, driven by the same TOML scene format.

Architecture (TPU-first, NOT a port):
  * recursion -> wavefront: fixed-shape ray pools advanced by `lax` loops
  * trait-object dispatch -> masked SoA table evaluation (`lax.switch`/select)
  * spectral Curve objects -> sampled LUT + CDF device arrays
  * rayon tiles -> `shard_map` over a `jax.sharding.Mesh`, film `psum`
  * splatting channel -> scatter-add
"""

import jax as _jax

# Geometry is precision-critical: TPU matmuls default to bf16 inputs, which
# makes ray->local einsum transforms miss real intersections (measured: ~6%
# wrong hits on the instanced-gem scene). A renderer has no use for lossy
# matmuls — force f32 accumulation everywhere in this package's graphs.
_jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"
