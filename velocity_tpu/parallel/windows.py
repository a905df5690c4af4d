"""Frame-window data parallelism + pose-graph stitching for long sequences.

The long-video analog of sequence parallelism (SURVEY.md §2.4): a video is cut
into overlapping keyframe windows; each window's bundle adjustment is
independent given its boundary anchors, so windows shard across one mesh axis
(pure data parallelism) while each window's point blocks shard across a second
axis (the ba_dist Schur reduction). Windows are then stitched into a global
trajectory by aligning the overlapping frames — a chain pose graph, which is
the exact graph shape of forward vehicle motion.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from velocity_tpu.config import BAConfig
from velocity_tpu.solvers.ba import BAProblem
from velocity_tpu.solvers.schur import (
    compute_blocks,
    schur_point_blocks,
    schur_camera_partials,
    schur_assemble_solve,
    schur_backsub,
)


def split_windows(n_frames: int, window: int, overlap: int = 1):
    """[(start, end), ...] covering n_frames with ``overlap`` shared frames."""
    if window <= overlap:
        raise ValueError("window must exceed overlap")
    out = []
    s = 0
    while True:
        e = min(s + window, n_frames)
        out.append((s, e))
        if e >= n_frames:
            return out
        s = e - overlap


def windowed_ba(
    pixels,  # (nw, nc, nt, 2)
    mask,  # (nw, nc, nt)
    points0,  # (nw, nt, 3)
    cams0,  # (nw, nc, 6)
    intr,
    mesh: Mesh,
    window_axis: str = "window",
    point_axis: str = "point",
    config: BAConfig = BAConfig(),
    fix_rotations: bool = False,
    pin_tracks: int = 0,
):
    """Batched per-window Schur BA: windows sharded over ``window_axis``,
    each window's tracks sharded over ``point_axis``.

    ``pin_tracks``: hold the first k tracks' structure fixed (their point
    Jacobians zero). Monocular BA has a scale gauge — points and cameras can
    shrink/grow jointly without changing any reprojection — so refinement
    must pin the metric anchor: the plate-corner tracks (lanes 0..3 by
    construction) whose geometry carries the plate's known size.

    Returns (points (nw, nt, 3), cams (nw, nc, 6), iterations (nw,)).
    """
    dtype = points0.dtype
    nw, nc, nt = pixels.shape[0], pixels.shape[1], pixels.shape[2]
    inv_f = 1.0 / intr.fx
    lam = config.damping * inv_f * inv_f
    tol = max(config.tol, 50.0 * float(jnp.finfo(dtype).eps))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(window_axis, None, point_axis, None),
            P(window_axis, None, point_axis),
            P(window_axis, point_axis, None),
            P(window_axis, None, None),
        ),
        out_specs=(
            P(window_axis, point_axis, None),
            P(window_axis, None, None),
            P(window_axis),
        ),
        check_vma=False,
    )
    def solve(pix_l, mask_l, pts_l, cams_l):
        def one_window(pix, msk, p0, c0):
            prob = BAProblem(intr=intr, pixels=pix, mask=msk, points0=p0, cams0=c0)

            def step(carry):
                points, cams, i, _ = carry
                blocks = compute_blocks(intr, prob, points, cams, fix_rotations)
                if pin_tracks > 0:
                    # zero the pinned lanes' point Jacobians -> gp = 0 there
                    # -> their structure (the metric scale anchor) never moves.
                    # NOTE: sharded tracks — the pinned lanes live on shard 0;
                    # use a global-lane mask so any shard layout works.
                    lane0 = jax.lax.axis_index(point_axis) * pix.shape[1]
                    lane = lane0 + jnp.arange(pix.shape[1])
                    pinned = (lane < pin_tracks)[None, :, None, None]
                    blocks = blocks._replace(A=jnp.where(pinned, 0.0, blocks.A))
                Vinv, gp, W = schur_point_blocks(blocks, lam, dtype)
                U, SW, gc, rhs_red = schur_camera_partials(blocks, Vinv, gp, W)
                U, SW, gc, rhs_red = jax.lax.psum((U, SW, gc, rhs_red), point_axis)
                dc_raw = schur_assemble_solve(
                    U, SW, gc, rhs_red, lam, dtype,
                    cg_tol=config.cg_tol,
                    cg_max_iters=(config.cg_max_iters
                                  if config.camera_solver == "cg" else 0),
                )
                dp = schur_backsub(Vinv, gp, W, dc_raw) * config.step_scale
                dcams = dc_raw.reshape(nc, 6) * config.step_scale
                sum_dp = jax.lax.psum(jnp.sum(dp * dp), point_axis)
                nx = jnp.asarray(nt * 3 + (nc - 1) * 6, dtype)
                drms = jnp.sqrt((sum_dp + jnp.sum(dcams[1:] ** 2)) / nx)
                return points + dp, cams + dcams, i + 1, drms

            def cond(carry):
                _, _, i, d = carry
                return (i < config.max_iters) & (d >= tol)

            points, cams, iters, _ = jax.lax.while_loop(
                cond, step, (p0, c0, jnp.int32(0), jnp.asarray(jnp.inf, dtype))
            )
            return points, cams, iters

        return jax.vmap(one_window)(pix_l, mask_l, pts_l, cams_l)

    return solve(pixels, mask, points0, cams0)


def _umeyama(src, dst, with_scale: bool):
    """Least-squares similarity (R, s, t) with dst ~= s * R @ src + t
    (Umeyama 1991). src/dst: (k, 3)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_s = (sc * sc).sum() / src.shape[0]
    s = float((D * np.diag(S)).sum() / var_s) if (with_scale and var_s > 0) else 1.0
    t = mu_d - s * R @ mu_s
    return R, s, t


def align_overlap(local_shared, global_shared, gauge: str = "auto"):
    """(R, s, t) mapping a window's local gauge onto the stitched global one,
    estimated from the shared (overlap) frames: ``global ~= s * R @ local + t``.

    ``gauge="similarity"``/"auto" fits the full Umeyama similarity when >= 3
    non-collinear shared frames exist; otherwise (or with
    ``gauge="translation"``) the fit degenerates to the mean offset. This is
    the variable-length form of ``stitch_windows`` used by the long-video
    driver, whose tracking segments are unequal.
    """
    local_shared = np.asarray(local_shared, np.float64)
    global_shared = np.asarray(global_shared, np.float64)
    k = local_shared.shape[0]
    use_sim = gauge in ("similarity", "auto") and k >= 3
    if use_sim:
        span = np.linalg.matrix_rank(
            local_shared - local_shared.mean(0), tol=1e-9)
        if span >= 2:
            return _umeyama(local_shared, global_shared, with_scale=True)
    t = (global_shared - local_shared).mean(axis=0)
    return np.eye(3), 1.0, t


def stitch_windows(cam_positions, overlap: int = 1, gauge: str = "auto"):
    """Chain-stitch per-window camera trajectories into one global trajectory.

    Each window's BA fixes its own gauge (window-local frame, first camera at
    the origin); consecutive windows share ``overlap`` frames, from which the
    inter-window transform is estimated:

    - ``gauge="translation"``: mean offset of the shared frames only (valid
      when rotations are pinned per window, e.g. the fix_rotations motion
      model, and the metric scale is plate-anchored in every window).
    - ``gauge="similarity"``: full Umeyama rotation+scale+translation fit on
      the shared frames — needed when per-window BA leaves rotation/scale
      gauge freedom. Requires overlap >= 3 non-collinear shared frames;
      degenerate overlaps fall back per-pair to translation.
    - ``gauge="auto"``: similarity when overlap >= 3, else translation.

    Args:
      cam_positions: (nw, F, 3) per-window positions, window-local frames.
      overlap: number of shared frames between consecutive windows.

    Returns:
      (n_total, 3) global positions, n_total = nw*F - (nw-1)*overlap.
    """
    cam_positions = np.asarray(cam_positions)
    nw, F, _ = cam_positions.shape
    use_sim = (gauge == "similarity") or (gauge == "auto" and overlap >= 3)
    out = [cam_positions[0].copy()]
    for w in range(1, nw):
        prev_g = out[-1][-overlap:] if overlap <= F else out[-1]
        cur = cam_positions[w]
        if use_sim and overlap >= 3:
            # guard collinear/degenerate overlap (vehicle path is near-linear):
            # similarity is well-posed only when the shared frames span a plane
            span = np.linalg.matrix_rank(
                (cur[:overlap] - cur[:overlap].mean(0)), tol=1e-9
            )
            if span >= 2:
                R, s, t = _umeyama(cur[:overlap], prev_g, with_scale=True)
            else:
                R, s, t = np.eye(3), 1.0, (prev_g - cur[:overlap]).mean(axis=0)
        else:
            R, s, t = np.eye(3), 1.0, (prev_g - cur[:overlap]).mean(axis=0)
        mapped = (s * (R @ cur.T)).T + t
        out.append(mapped[overlap:])
    return np.concatenate(out, axis=0)
