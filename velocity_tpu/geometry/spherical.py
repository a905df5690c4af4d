"""Spherical/NED coordinate conversions.

Parity: reference ``cc2sc``/``sc2cc``/``elaz``/``cam2ned``
(/root/reference/utils/common.py:67-112,159-164), restricted to the row-wise
(N, 3) convention and batched over leading axes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# +X_ned(NORTH)=+Z_cam, +Y_ned(EAST)=+X_cam, +Z_ned(DOWN)=+Y_cam.
# x_ned = R @ x_cam (columns)  ==  x_ned_rows = x_cam_rows @ R.T (rows).
CAM_TO_NED = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], dtype=np.float64)


def cam_to_ned_matrix(dtype=jnp.float32):
    """The camera->NED permutation matrix as a jnp array of ``dtype``."""
    return jnp.asarray(CAM_TO_NED, dtype=dtype)


def elevation_azimuth(x):
    """Cartesian (..., 3) -> [elevation, azimuth] (..., 2) in radians."""
    r = jnp.sqrt(jnp.sum(x * x, axis=-1))
    el = jnp.arcsin(-x[..., 2] / r)
    az = jnp.arctan2(x[..., 1], x[..., 0])
    return jnp.stack([el, az], axis=-1)


def cartesian_to_spherical(x):
    """Cartesian (..., 3) -> spherical [range, elevation, azimuth] (..., 3)."""
    r = jnp.sqrt(jnp.sum(x * x, axis=-1))
    el = jnp.arcsin(-x[..., 2] / r)
    az = jnp.arctan2(x[..., 1], x[..., 0])
    return jnp.stack([r, el, az], axis=-1)


def spherical_to_cartesian(s):
    """Spherical [range, elevation, azimuth] (..., 3) -> cartesian (..., 3)."""
    r, el, az = s[..., 0], s[..., 1], s[..., 2]
    a = r * jnp.cos(el)
    return jnp.stack([a * jnp.cos(az), a * jnp.sin(az), -r * jnp.sin(el)], axis=-1)
