"""raytracedggx_tpu — a TPU-native real-time ray tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
StarsX/RayTracedGGX (a DirectX 12 DXR ray tracer): 1-spp GGX reflection +
cosine-sampled diffuse GI per frame, primary surfaces from a visibility
buffer, spatial-temporal denoising and tone mapping, with per-frame
acceleration-structure refit for animated instances.

Design stance (SURVEY.md §7): D3D12 concepts (command lists, descriptor
heaps, barriers, PSOs, shader tables) dissolve into jitted functions over
arrays.  What is rebuilt for real: the renderer algorithms, the BVH
build/refit + traversal (what DXR did in the driver), the frame scheduler,
and the asset loaders.
"""

__version__ = "0.1.0"

import jax as _jax

# On TPU, float32 matmuls default to bf16 MXU passes.  The renderer's matrix
# work (camera/instance transforms, unprojection, 4x4 inverses) is tiny but
# precision-critical: bf16 rounding of a world matrix shows up as ~1e-3 NDC
# reprojection error, which breaks motion vectors and TAA history lookups.
# The hot paths (traversal, stencils) are VPU elementwise work and don't use
# the MXU, so forcing full f32 here costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")
