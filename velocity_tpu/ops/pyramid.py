"""Image pyramids and resizing, matching OpenCV semantics where the reference
depends on them.

- ``pyr_down``: 5-tap Gaussian [1,4,6,4,1]/16 separable smoothing with
  reflect-101 borders, then 2x decimation at even indices, output size
  ((h+1)//2, (w+1)//2) — cv2.pyrDown / buildOpticalFlowPyramid semantics.
- ``resize_nearest``: cv2.resize INTER_NEAREST (used by the reference for its
  1/4-scale coarse image, KLT.py:111-113: dst(i,j) = src(floor(i/s), floor(j/s))).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_G5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _reflect101_pad(img, pad: int):
    """Reflect-101 (edge pixel not repeated) padding on both axes."""
    return jnp.pad(img, pad, mode="reflect")


def pyr_down(img):
    """One Gaussian pyramid level down (cv2.pyrDown semantics)."""
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = img.astype(dtype)
    k = jnp.asarray(_G5, dtype)
    p = _reflect101_pad(x, 2)
    # separable convolution via stacked shifts (small fixed kernel -> XLA fuses)
    H, W = x.shape
    rows = sum(k[i] * p[i : i + H, 2 : 2 + W] for i in range(5))
    p2 = _reflect101_pad(rows, 2)[2 : 2 + H, :]
    smoothed = sum(k[j] * p2[:, j : j + W] for j in range(5))
    return smoothed[::2, ::2]


def build_pyramid(img, max_level: int):
    """List of ``max_level + 1`` images; level 0 is the input (as float)."""
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    levels = [img.astype(dtype)]
    for _ in range(max_level):
        levels.append(pyr_down(levels[-1]))
    return levels


def resize_nearest(img, scale: float):
    """cv2.resize INTER_NEAREST with fx=fy=scale (scale<=1 decimation)."""
    H, W = img.shape
    h = int(round(H * scale))
    w = int(round(W * scale))
    ii = jnp.minimum(jnp.floor(jnp.arange(h) / scale).astype(jnp.int32), H - 1)
    jj = jnp.minimum(jnp.floor(jnp.arange(w) / scale).astype(jnp.int32), W - 1)
    return img[ii[:, None], jj[None, :]]
