"""Rotation parameterizations: roll-pitch-yaw <-> direction cosine matrices.

Convention parity: the DCM layout matches the reference ``rpy2dcm``
(/root/reference/utils/transforms.py:7-23) and is applied to row-vector points as
``x @ C``. ``matrix_to_rpy`` deliberately reproduces the reference's use of
``atan`` (not ``atan2``) for roll (/root/reference/utils/transforms.py:51-57) so
pose solver iterates stay comparable.
"""

from __future__ import annotations

import jax.numpy as jnp


def rpy_to_matrix(rpy):
    """Direction cosine matrix from [roll, pitch, yaw]; batched over leading axes.

    Args:
      rpy: (..., 3) array of roll, pitch, yaw in radians.

    Returns:
      (..., 3, 3) DCM ``C`` such that row-vector points transform as ``x @ C``.
    """
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    sr, cr = jnp.sin(r), jnp.cos(r)
    sp, cp = jnp.sin(p), jnp.cos(p)
    sy, cy = jnp.sin(y), jnp.cos(y)

    row0 = jnp.stack([cp * cy, sr * sp * cy - cr * sy, cr * sp * cy + sr * sy], axis=-1)
    row1 = jnp.stack([cp * sy, sr * sp * sy + cr * cy, cr * sp * sy - sr * cy], axis=-1)
    row2 = jnp.stack([-sp, sr * cp, cr * cp], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_rpy(C):
    """[roll, pitch, yaw] from a direction cosine matrix; batched over leading axes.

    Roll uses ``atan(C21/C22)`` (quadrant-limited) for parity with the reference's
    ``dcm2rpy``; pitch is ``asin(-C20)``; yaw is ``atan2(C10, C00)``.
    """
    roll = jnp.arctan(C[..., 2, 1] / C[..., 2, 2])
    pitch = jnp.arcsin(-C[..., 2, 0])
    yaw = jnp.arctan2(C[..., 1, 0], C[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rotate_translate(points, rpy, t):
    """Fused rotate+translate: ``points @ rpy_to_matrix(rpy) + t``.

    Args:
      points: (..., N, 3) row-vector points.
      rpy: (..., 3) roll-pitch-yaw.
      t: (..., 3) translation, broadcast over points.

    Parity: reference ``transform`` (/root/reference/utils/transforms.py:27-48).
    """
    C = rpy_to_matrix(rpy)
    return points @ C + t[..., None, :]
