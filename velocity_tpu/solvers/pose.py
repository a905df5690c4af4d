"""Camera pose solvers: plate-anchored NLS with masked static shapes.

Parity targets:
- ``solve_translation``  <-> reference ``fcnNLS_t``  (/root/reference/utils/NLS.py:102-129)
- ``solve_pose_rt``      <-> reference ``fcnNLS_Rt`` (/root/reference/utils/NLS.py:133-183)
- ``estimate_world_camera_pose`` <-> reference ``estimateWorldCameraPose`` (NLS.py:9-33)

All solvers take a validity ``mask`` over points so they run with static shapes
under jit; masked points contribute nothing to the normal equations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from velocity_tpu.config import SolverConfig
from velocity_tpu.geometry.projection import (
    Intrinsics,
    project_camera_points,
    world_to_image,
)
from velocity_tpu.geometry.rotations import rpy_to_matrix, matrix_to_rpy
from velocity_tpu.solvers.lm import lm_solve, LMResult


class PoseResult(NamedTuple):
    t: jnp.ndarray  # (3,) camera->plate translation (camera frame)
    R: jnp.ndarray  # (3, 3) rotation (row-vector convention)
    residual_rms: jnp.ndarray  # masked rms reprojection error (px)
    p_proj: jnp.ndarray  # (N, 2) reprojected points (all lanes)
    iterations: jnp.ndarray


def _masked_residual(intr, p, mask, predict):
    """Build r = where(mask, (p - predict(x))/fx, 0) flattened, + valid count
    and the matching damping scale.

    ``where`` (not multiply) so NaN observations or projections in masked lanes
    cannot poison the residual or its Jacobian.

    The residual is expressed in *normalized* image units (pixels / fx): this
    rescales J^T J from pixel^2 (~1e7, f32-hostile) to O(1) conditioning. With
    the Marquardt damping scaled by 1/fx^2 the LM iterates are mathematically
    identical to the reference's pixel-unit iterates (delta is invariant under
    r -> s*r, lambda -> s^2*lambda), so golden parity is preserved while f32
    becomes usable on TPU. Assumes fx == fy (true for the whole camera DB).
    """
    m = mask[:, None]
    inv_f = 1.0 / intr.fx

    def residual(x):
        return (jnp.where(m, p - predict(x), 0.0) * inv_f).ravel()

    nvalid = 2.0 * jnp.sum(mask)
    damping_scale = inv_f * inv_f
    return residual, nvalid, damping_scale


def solve_translation(
    intr: Intrinsics,
    p: jnp.ndarray,  # (N, 2) observed pixels
    pw: jnp.ndarray,  # (N, 3) world points (camera-frame, R folded in by caller)
    t0: jnp.ndarray,  # (3,) initial translation
    mask: jnp.ndarray | None = None,  # (N,) bool validity
    config: SolverConfig = SolverConfig(),
) -> LMResult:
    """3-parameter LM: find t minimizing ||p - project(pw + t)|| over valid lanes."""
    if mask is None:
        mask = jnp.ones(p.shape[0], bool)
    residual, nvalid, dscale = _masked_residual(
        intr, p, mask, lambda x: project_camera_points(intr, pw + x)
    )
    return lm_solve(
        residual,
        jnp.asarray(t0),
        max_iters=config.max_iters_pose,
        damping=config.damping * dscale,
        tol=config.tol,
        ramp_rate=config.ramp_rate,
        num_residuals=nvalid,
    )


def solve_pose_rt(
    intr: Intrinsics,
    p: jnp.ndarray,  # (N, 2)
    pw: jnp.ndarray,  # (N, 3)
    x0: jnp.ndarray,  # (6,) [rpy, t]
    mask: jnp.ndarray | None = None,
    config: SolverConfig = SolverConfig(),
) -> LMResult:
    """6-parameter LM over [roll, pitch, yaw, tx, ty, tz]."""
    if mask is None:
        mask = jnp.ones(p.shape[0], bool)
    residual, nvalid, dscale = _masked_residual(
        intr,
        p,
        mask,
        lambda x: project_camera_points(intr, pw @ rpy_to_matrix(x[:3]) + x[3:6]),
    )
    return lm_solve(
        residual,
        jnp.asarray(x0),
        max_iters=config.max_iters_pose,
        damping=config.damping * dscale,
        tol=config.tol,
        ramp_rate=config.ramp_rate,
        num_residuals=nvalid,
    )


def estimate_world_camera_pose(
    intr: Intrinsics,
    p: jnp.ndarray,  # (N, 2)
    p3: jnp.ndarray,  # (N, 3) world points
    t0: jnp.ndarray | None = None,
    R0: jnp.ndarray | None = None,
    find_R: bool = False,
    mask: jnp.ndarray | None = None,
    config: SolverConfig = SolverConfig(),
) -> PoseResult:
    """Full pose estimation entry point (reference estimateWorldCameraPose).

    find_R=True: 6-DoF solve from x0=[dcm2rpy(R0), t0]. find_R=False: hold R0,
    solve translation of ``p3`` (caller pre-rotates if needed; the reference
    driver passes plate-plane points already in the R-frame).
    """
    dtype = jnp.asarray(p).dtype
    if t0 is None:
        t0 = jnp.array([0.0, 0.0, 1.0], dtype)
    if R0 is None:
        R0 = jnp.eye(3, dtype=dtype)
    if mask is None:
        mask = jnp.ones(p.shape[0], bool)

    if find_R:
        x0 = jnp.concatenate([matrix_to_rpy(R0), t0])
        res = solve_pose_rt(intr, p, p3, x0, mask, config)
        R = rpy_to_matrix(res.x[:3]).astype(dtype)
        t = res.x[3:6].astype(dtype)
    else:
        res = solve_translation(intr, p, p3, t0, mask, config)
        R = R0
        if config.pose_reject_sigma > 0 and config.pose_reject_above_px > 0:
            # robust second pass: reject >sigma*rms outliers only when the
            # first pass is bad (degrading structure, e.g. static-background
            # lanes at high speed poisoning the rigid-cloud model); otherwise
            # the second solve repeats the first from its own optimum with
            # the unchanged mask — numerically a no-op.
            proj1 = world_to_image(intr, R.astype(dtype), res.x.astype(dtype), p3)
            err1 = jnp.where(mask, jnp.linalg.norm(p - proj1, axis=1), 0.0)
            nv1 = jnp.maximum(jnp.sum(mask), 1)
            rms1 = jnp.sqrt(jnp.sum(err1 * err1) / nv1)
            bad = rms1 > config.pose_reject_above_px
            keep = err1 <= config.pose_reject_sigma * rms1
            mask2 = mask & (keep | ~bad)
            # never reject below a minimum support (solver needs >= 3 lanes)
            mask2 = jnp.where(jnp.sum(mask2) >= 8, mask2, mask)
            res = solve_translation(intr, p, p3, res.x, mask2, config)
            mask = mask2
        t = res.x.astype(dtype)

    p_proj = world_to_image(intr, R.astype(dtype), t, p3)
    m = mask[:, None].astype(dtype)
    err = (p - p_proj) * m
    nvalid = jnp.maximum(2.0 * jnp.sum(mask), 1.0)
    rms = jnp.sqrt(jnp.sum(err * err) / nvalid)
    return PoseResult(t=t, R=R, residual_rms=rms, p_proj=p_proj, iterations=res.iterations)
