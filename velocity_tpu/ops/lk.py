"""Batched pyramidal Lucas-Kanade tracking with fused affine-prior sampling.

Replicates cv2.calcOpticalFlowPyrLK semantics (the reference's hot kernel,
KLT.py:37-51,99-134) as a batched, static-shape XLA computation:

- Scharr-smoothed spatial gradients of the source patch, fixed per level.
- Iterative 2x2 Gauss-Newton solve on the destination patch with bilinear
  sampling, per-point early-stop via masks (eps on |delta|^2), OpenCV's
  oscillation damping, bounds and min-eigenvalue status gating.
- Optional affine "prior" maps on either image: instead of materializing a
  warped image (cv2.remap, KLT.py:70-73) and tracking on it, the sample grid
  is pushed through the affine map — one interpolation instead of two, which
  is both faster and slightly sharper. Gradients are chain-ruled through the
  map's linear part.

Forward-backward gating (``lk_forward_backward``) mirrors the reference's
cv2calcOpticalFlowPyrLK(fbt=...) wrapper.

Units note: gradients are kept in true intensity-per-pixel units; OpenCV's
fixed-point minEigThreshold (default 1e-4) converts to ``1024 *
min_eig_threshold`` in these units (OpenCV accumulates (32g)^2 * 2^-20).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from velocity_tpu.ops.interp import bilinear_sample
from velocity_tpu.ops.pyramid import build_pyramid


def scharr_derivatives(img):
    """Scharr-smoothed central-difference gradients (gx, gy), true units.

    Smoothing [3,10,3]/16 across, difference [-1,0,1]/2 along; replicate border.
    """
    x = img
    p = jnp.pad(x, 1, mode="edge")
    H, W = x.shape
    row_m, row_0, row_p = p[0:H, 1 : 1 + W], p[1 : 1 + H, 1 : 1 + W], p[2 : 2 + H, 1 : 1 + W]
    smooth_v = (3.0 * row_m + 10.0 * row_0 + 3.0 * row_p) / 16.0  # vertical smooth
    col_m, col_0, col_p = p[1 : 1 + H, 0:W], p[1 : 1 + H, 1 : 1 + W], p[1 : 1 + H, 2 : 2 + W]
    smooth_h = (3.0 * col_m + 10.0 * col_0 + 3.0 * col_p) / 16.0  # horizontal smooth

    pv = jnp.pad(smooth_v, 1, mode="edge")
    gx = (pv[1 : 1 + H, 2 : 2 + W] - pv[1 : 1 + H, 0:W]) * 0.5
    ph = jnp.pad(smooth_h, 1, mode="edge")
    gy = (ph[2 : 2 + H, 1 : 1 + W] - ph[0:H, 1 : 1 + W]) * 0.5
    return gx, gy


def _affine_for_level(M, level, dtype):
    """Level-L sampling map: linear part unchanged, translation / 2^L."""
    if M is None:
        return None
    M = jnp.asarray(M, dtype)
    s = jnp.asarray(1.0 / (1 << level), dtype)
    return jnp.concatenate([M[:, :2], M[:, 2:3] * s], axis=1)


def _apply_affine(M, x, y):
    if M is None:
        return x, y
    return (
        M[0, 0] * x + M[0, 1] * y + M[0, 2],
        M[1, 0] * x + M[1, 1] * y + M[1, 2],
    )


def _sample_grid(img, cx, cy, off, M):
    """Sample (N, W, W) patch around centers (cx, cy) through optional map M."""
    gx = cx[:, None, None] + off[None, None, :]
    gy = cy[:, None, None] + off[None, :, None]
    sx, sy = _apply_affine(M, gx, gy)
    return bilinear_sample(img, sx, sy)


class LKResult(NamedTuple):
    points: jnp.ndarray  # (N, 2) tracked points (source-frame coords if warp_dst)
    status: jnp.ndarray  # (N,) bool


@partial(
    jax.jit,
    static_argnames=("win", "max_level", "iters", "eps", "min_eig_threshold"),
)
def lk_pyramidal(
    src_img,
    dst_img,
    pts_src,
    guess=None,
    *,
    win: int = 15,
    max_level: int = 4,
    iters: int = 10,
    eps: float = 0.1,
    min_eig_threshold: float = 1e-4,
    warp_src=None,
    warp_dst=None,
) -> LKResult:
    """Track ``pts_src`` from ``src_img`` into ``dst_img``.

    The solved coordinates live in the source frame when ``warp_dst`` is given
    (destination samples are taken at ``warp_dst(x)``); with no warps this is
    plain calcOpticalFlowPyrLK.

    Args:
      src_img, dst_img: (H, W) grayscale (uint8 or float).
      pts_src: (N, 2) float points.
      guess: optional (N, 2) initial estimates (defaults to pts_src).
      warp_src / warp_dst: optional (2, 3) affine sample maps at level-0 scale.
    """
    dtype = pts_src.dtype if jnp.issubdtype(pts_src.dtype, jnp.floating) else jnp.float32
    pts_src = pts_src.astype(dtype)
    src_pyr = build_pyramid(src_img.astype(dtype), max_level)
    dst_pyr = build_pyramid(dst_img.astype(dtype), max_level)

    N = pts_src.shape[0]
    half = (win - 1) * 0.5
    off = jnp.arange(win, dtype=dtype) - half
    eps2 = jnp.asarray(eps * eps, dtype)
    eig_thresh = jnp.asarray(min_eig_threshold * 1024.0, dtype)

    next_pts = (guess if guess is not None else pts_src).astype(dtype)
    next_pts = next_pts * (1.0 / (1 << max_level))
    status = jnp.ones(N, bool)

    for level in range(max_level, -1, -1):
        simg = src_pyr[level]
        dimg = dst_pyr[level]
        Hs, Ws = simg.shape
        Hd, Wd = dimg.shape
        scale = 1.0 / (1 << level)
        Ms = _affine_for_level(warp_src, level, dtype)
        Md = _affine_for_level(warp_dst, level, dtype)

        p_l = pts_src * scale
        cx, cy = p_l[:, 0], p_l[:, 1]

        # source in-bounds check (OpenCV: corner within [-win, size))
        ix = jnp.floor(cx - half)
        iy = jnp.floor(cy - half)
        src_ok = (ix >= -win) & (iy >= -win) & (ix < Ws) & (iy < Hs)

        # fixed source patch + gradient patches (chain rule through warp_src)
        patch_s = _sample_grid(simg, cx, cy, off, Ms)
        sgx, sgy = scharr_derivatives(simg)
        gxp = _sample_grid(sgx, cx, cy, off, Ms)
        gyp = _sample_grid(sgy, cx, cy, off, Ms)
        if Ms is not None:
            gxp, gyp = Ms[0, 0] * gxp + Ms[1, 0] * gyp, Ms[0, 1] * gxp + Ms[1, 1] * gyp

        a11 = jnp.sum(gxp * gxp, axis=(1, 2))
        a12 = jnp.sum(gxp * gyp, axis=(1, 2))
        a22 = jnp.sum(gyp * gyp, axis=(1, 2))
        det = a11 * a22 - a12 * a12
        tr = a11 + a22
        min_eig = (tr - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) * 0.5 / (win * win)
        eig_ok = (min_eig >= eig_thresh) & (det >= jnp.finfo(dtype).tiny * 16)
        trackable = src_ok & eig_ok

        if level == 0:
            status = status & trackable

        inv_det = jnp.where(det != 0, 1.0 / det, 0.0)

        def body(j, carry):
            npts, done, prev_delta = carry
            nx, ny = npts[:, 0], npts[:, 1]
            # destination bounds (status fail at level 0 handled after loop)
            inx = jnp.floor(nx - half)
            iny = jnp.floor(ny - half)
            in_ok = (inx >= -win) & (iny >= -win) & (inx < Wd) & (iny < Hd)

            patch_d = _sample_grid(dimg, nx, ny, off, Md)
            diff = patch_d - patch_s
            b1 = jnp.sum(diff * gxp, axis=(1, 2))
            b2 = jnp.sum(diff * gyp, axis=(1, 2))
            # solve G delta = -b  (gradient from source; OpenCV sign convention)
            dx = -(a22 * b1 - a12 * b2) * inv_det
            dy = -(a11 * b2 - a12 * b1) * inv_det
            delta = jnp.stack([dx, dy], axis=1)

            active = (~done) & trackable & in_ok
            npts = jnp.where(active[:, None], npts + delta, npts)

            small = jnp.sum(delta * delta, axis=1) <= eps2
            # OpenCV oscillation damping: delta ~ -prev_delta -> back off half
            osc = (j > 0) & (jnp.abs(delta + prev_delta) < 0.01).all(axis=1)
            npts = jnp.where((active & osc)[:, None], npts - delta * 0.5, npts)
            done = done | small | osc | ~in_ok
            return npts, done, jnp.where(active[:, None], delta, prev_delta)

        done0 = jnp.zeros(N, bool)
        pd0 = jnp.zeros((N, 2), dtype)
        next_pts, _, _ = jax.lax.fori_loop(0, iters, body, (next_pts, done0, pd0))

        if level == 0:
            # final destination bounds check
            inx = jnp.floor(next_pts[:, 0] - half)
            iny = jnp.floor(next_pts[:, 1] - half)
            status = status & (inx >= -win) & (iny >= -win) & (inx < Wd) & (iny < Hd)
        else:
            next_pts = next_pts * 2.0

    return LKResult(points=next_pts, status=status)


def lk_forward_backward(
    src_img,
    dst_img,
    pts_src,
    *,
    fb_threshold: float | None = None,
    warp_dst=None,
    guess=None,
    **lk_kwargs,
) -> LKResult:
    """Forward LK plus optional backward pass with forward-backward gating.

    Parity: reference ``cv2calcOpticalFlowPyrLK`` (KLT.py:37-51). The backward
    pass tracks the forward results back into the source image (with the warp
    roles swapped when a destination warp is in play) and invalidates points
    whose round trip misses by more than ``fb_threshold`` pixels. ``guess``
    seeds only the forward pass; the backward pass starts from its result.
    """
    fwd = lk_pyramidal(src_img, dst_img, pts_src, guess=guess,
                       warp_dst=warp_dst, **lk_kwargs)
    if fb_threshold is None:
        return fwd
    bwd = lk_pyramidal(
        dst_img,
        src_img,
        fwd.points,
        guess=fwd.points,
        warp_src=warp_dst,
        **lk_kwargs,
    )
    fbe = jnp.sqrt(jnp.sum((pts_src - bwd.points) ** 2, axis=1))
    ok = fwd.status & bwd.status & (fbe < fb_threshold)
    return LKResult(points=fwd.points, status=ok)
