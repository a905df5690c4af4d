"""Geometry core: rotations, pinhole projection, spherical coordinates, plate geometry.

All functions are pure jax.numpy, dtype-polymorphic, batched over leading axes, and
safe to call under jit/vmap/scan. Conventions follow the reference implementation
(ultralytics/velocity) so results are comparable bit-for-bit at the data boundary:

- **Row-vector convention**: points are (N, 3) rows; rotations apply as ``x @ C``.
- **Intrinsics**: pinhole ``u = (fx*X + skew*Y)/Z + cx``, ``v = fy*Y/Z + cy``
  (equivalent to the reference's MATLAB-transposed ``p = [pw 1] @ [[R];[t]] @ K``,
  see /root/reference/utils/common.py:58-64).
- **rpy**: aerospace roll-pitch-yaw (x-y-z intrinsic; ZYX extrinsic composition).
"""

from velocity_tpu.geometry.rotations import (  # noqa: F401
    rpy_to_matrix,
    matrix_to_rpy,
    rotate_translate,
)
from velocity_tpu.geometry.projection import (  # noqa: F401
    Intrinsics,
    perspective_divide,
    project_camera_points,
    world_to_image,
    image_to_world_plane,
    pixel_to_unit_ray,
    pixel_to_angle,
)
from velocity_tpu.geometry.spherical import (  # noqa: F401
    cartesian_to_spherical,
    spherical_to_cartesian,
    elevation_azimuth,
    CAM_TO_NED,
    cam_to_ned_matrix,
)
from velocity_tpu.geometry.plate import license_plate_points  # noqa: F401
from velocity_tpu.geometry.norms import norm, rms, unit_rows, append_col  # noqa: F401
