"""Dense affine warping (cv2.remap equivalent) for tests, viz, and the optional
exact two-interpolation replication of the reference's warp-then-track path
(KLT.py:70-73). The production tracker fuses the warp into LK sampling instead
(ops/lk.py warp_dst)."""

from __future__ import annotations

import jax.numpy as jnp

from velocity_tpu.ops.interp import bilinear_sample


def affine_warp(img, M, out_shape, offset=(0.0, 0.0), border: str = "zero"):
    """out(i, j) = img(M @ [j + ox, i + oy, 1]) with bilinear sampling.

    ``offset`` shifts the output grid origin (the reference warps ROI grids
    starting at (x0, y0), KLT.py:70-72).
    """
    H, W = out_shape
    dtype = jnp.result_type(img.dtype, jnp.float32)
    ox, oy = offset
    xs = jnp.arange(W, dtype=dtype) + ox
    ys = jnp.arange(H, dtype=dtype) + oy
    gx, gy = jnp.meshgrid(xs, ys)
    sx = M[0, 0] * gx + M[0, 1] * gy + M[0, 2]
    sy = M[1, 0] * gx + M[1, 1] * gy + M[1, 2]
    return bilinear_sample(img.astype(dtype), sx, sy, border=border)
