"""velocity_tpu — a TPU-native structure-from-motion vehicle speed estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ultralytics/velocity
(monocular vehicle speed estimation via license-plate-anchored SfM):

- ``geometry``: rotations, pinhole projection, spherical/NED coordinates, plate geometry
- ``camera``:   intrinsics database, annotation loading, EXIF/GPS ingest
- ``ingest``:   host-side video/stills decode feeding device pipelines
- ``ops``:      batched image ops (pyramids, Lucas-Kanade tracking, Harris corners,
                RANSAC, warps) as XLA/Pallas kernels
- ``solvers``:  Levenberg-Marquardt pose solvers, multi-view triangulation,
                bundle adjustment (dense and Schur-complement block-sparse)
- ``parallel``: device-mesh sharding of bundle adjustment and frame windows
- ``pipeline``: the end-to-end speed estimation driver
- ``viz``:      results visualization

Design stance (TPU-first): static shapes with validity masks, functional state
threaded through ``lax.scan``/``lax.while_loop``, analytic Jacobians via ``jacfwd``,
collectives via ``shard_map``/``psum`` over ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: compiles survive process restarts (the
# difference between minutes and milliseconds of startup when the TPU sits
# behind a remote-compile tunnel).
_cache_dir = _os.environ.get(
    "VELOCITY_TPU_CACHE", _os.path.expanduser("~/.cache/velocity_tpu_xla")
)
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs — not fatal
    pass

# SfM correctness requires true-f32 matmuls: TPU default precision lowers f32
# dot/einsum operands to bf16, which injects ~5 px projection error on distant
# points (0.4% relative on ~50 m coordinates). All matmuls in this framework
# are small (Nx3 @ 3x3 geometry, 2x3/2x6 BA blocks), so 'highest' costs
# nothing; precision-tolerant future kernels can request lower per-op.
_jax.config.update("jax_default_matmul_precision", "highest")

from velocity_tpu import geometry  # noqa: F401
