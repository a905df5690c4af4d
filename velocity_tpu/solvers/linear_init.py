"""Linear pose initializers.

Parity targets (dormant in the reference but part of its API surface):
- ``planar_pose``  <-> ``extrinsicsPlanar`` (/root/reference/utils/NLS.py:37-68):
  DLT homography from plane points to pixels, then R from the first two
  homography columns orthogonalized by SVD, t from the third.
- ``rotation_lsq`` <-> ``fcnLS_R`` (/root/reference/utils/NLS.py:89-98):
  least-squares rotation aligning world directions to pixel rays, SVD-projected
  onto SO(3) ("MSVM paper EQN 20").
"""

from __future__ import annotations

import jax.numpy as jnp

from velocity_tpu.geometry.norms import unit_rows
from velocity_tpu.geometry.projection import Intrinsics, pixel_to_unit_ray


def dlt_homography(src, dst):
    """Least-squares planar homography H (3x3): dst ~ normalize([src 1] @ H^T).

    src: (N, 2) plane points; dst: (N, 2) pixels; N >= 4. Row-vector DLT with
    Hartley normalization for conditioning.
    """
    dtype = src.dtype

    def normalizer(p):
        mu = jnp.mean(p, axis=0)
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.mean(jnp.linalg.norm(p - mu, axis=1)), 1e-12
        )
        T = jnp.array(
            [[scale, 0, -scale * mu[0]], [0, scale, -scale * mu[1]], [0, 0, 1.0]],
            dtype,
        )
        return T

    Ts, Td = normalizer(src), normalizer(dst)
    sh = jnp.concatenate([src, jnp.ones((src.shape[0], 1), dtype)], 1) @ Ts.T
    dh = jnp.concatenate([dst, jnp.ones((dst.shape[0], 1), dtype)], 1) @ Td.T

    x, y = sh[:, 0], sh[:, 1]
    u, v = dh[:, 0], dh[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=1)
    rows_v = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Hn = Vt[-1].reshape(3, 3)
    H = jnp.linalg.inv(Td) @ Hn @ Ts
    return H / H[2, 2]


def planar_pose(intr: Intrinsics, pixels, plane_pts):
    """Closed-form pose from >=4 coplanar correspondences (z=0 plane).

    Returns (R, t) in the framework's row-vector convention
    (``pixels ~ project(plane3 @ R + t)``).
    """
    dtype = pixels.dtype
    H = dlt_homography(plane_pts[:, 0:2].astype(dtype), pixels)
    # column-convention decomposition: x_pix_h ~ K_col @ [r1 r2 t] [X Y 1]^T
    K_col = jnp.array(
        [
            [intr.fx, intr.skew, intr.cx],
            [0.0, intr.fy, intr.cy],
            [0.0, 0.0, 1.0],
        ],
        dtype,
    )
    B = jnp.linalg.solve(K_col, H)
    lam = 1.0 / jnp.linalg.norm(B[:, 0])
    # enforce positive depth (plane in front of the camera)
    lam = jnp.where(B[2, 2] * lam > 0, lam, -lam)
    r1 = B[:, 0] * lam
    r2 = B[:, 1] * lam
    r3 = jnp.cross(r1, r2)
    Rc = jnp.stack([r1, r2, r3], axis=1)  # columns
    U, _, Vt = jnp.linalg.svd(Rc)
    Rc = U @ Vt
    t = B[:, 2] * lam
    # column-convention X_cam = Rc @ X_w + t  ->  row convention x @ Rc^T + t
    return Rc.T, t


def rotation_lsq(intr: Intrinsics, pixels, world_pts):
    """Least-squares rotation: pixel rays ~ unit(world_pts) @ R, SVD-projected.

    Parity: reference fcnLS_R (NLS.py:89-98).
    """
    z = pixel_to_unit_ray(intr, pixels)
    Hm = unit_rows(world_pts)
    R = jnp.linalg.solve(Hm.T @ Hm, Hm.T @ z)
    U, _, Vt = jnp.linalg.svd(R)
    return U @ Vt
