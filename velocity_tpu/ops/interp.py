"""Bilinear sampling and patch gathering — the common core of LK/warp/subpix.

These are the gather primitives everything image-side builds on. The XLA
lowering is a batched gather; the Pallas kernels (ops/*_pallas.py) replace them
on the TPU hot path with per-point VMEM DMA + VPU blends.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img, x, y, border: str = "clamp"):
    """Sample ``img`` at float coordinates (x, y) with bilinear interpolation.

    Args:
      img: (H, W) array.
      x, y: broadcastable float arrays of sample coordinates (pixel units,
        origin at pixel centers — matches cv2.remap INTER_LINEAR).
      border: "clamp" replicates edges; "zero" returns 0 outside (cv2.remap
        BORDER_CONSTANT default).

    Returns:
      sampled values, float32/float64 per input dtype promotion.
    """
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ax = x - x0
    ay = y - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]

    out = (
        v00 * (1 - ax) * (1 - ay)
        + v01 * ax * (1 - ay)
        + v10 * (1 - ax) * ay
        + v11 * ax * ay
    )
    if border == "zero":
        inside = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
        out = jnp.where(inside, out, 0.0)
    return out


def _patch_offsets(size: int, dtype):
    """(size,) window offsets centered at 0: j - (size-1)/2."""
    half = (size - 1) * 0.5
    return jnp.arange(size, dtype=dtype) - half


def gather_patches(img, centers, size: int, border: str = "clamp"):
    """Gather (N, size, size) bilinear patches centered at ``centers`` (N, 2) xy."""
    dtype = centers.dtype
    off = _patch_offsets(size, dtype)
    # coords: (N, size, size)
    x = centers[:, 0, None, None] + off[None, None, :]
    y = centers[:, 1, None, None] + off[None, :, None]
    return bilinear_sample(img, x, y, border)


def affine_grid_patches(img, centers, size: int, M, border: str = "clamp"):
    """Gather patches whose sample grid is mapped through affine ``M`` (2x3).

    The window grid lives in *source* coordinates around ``centers``; each grid
    point g is sampled from ``img`` at ``M_lin @ g + M_t``. This fuses the
    reference's warp-then-track (cv2.remap + LK, KLT.py:70-83) into a single
    interpolation.
    """
    dtype = centers.dtype
    off = _patch_offsets(size, dtype)
    gx = centers[:, 0, None, None] + off[None, None, :]
    gy = centers[:, 1, None, None] + off[None, :, None]
    x = M[0, 0] * gx + M[0, 1] * gy + M[0, 2]
    y = M[1, 0] * gx + M[1, 1] * gy + M[1, 2]
    return bilinear_sample(img, x, y, border)
