"""Device-mesh parallelism: sharded bundle adjustment, frame-window data
parallelism, and pose-graph stitching for long sequences."""

from velocity_tpu.parallel.mesh import make_mesh, device_counts  # noqa: F401
from velocity_tpu.parallel.ba_dist import ba_schur_sharded  # noqa: F401
from velocity_tpu.parallel.windows import (  # noqa: F401
    windowed_ba,
    stitch_windows,
    split_windows,
)
