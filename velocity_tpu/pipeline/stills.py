"""Stills-burst speed estimation (the reference's isVideo=False path,
vidExample.py:25-29,92-95) plus EXIF/GPS georegistration (the MATLAB driver's
extra, runExample.m:156-159).

Timing comes from EXIF DateTimeOriginal + SubSecTimeOriginal per image; the
camera track is georegistered to ECEF/NED about the first image's GPS fix.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from velocity_tpu.config import PipelineConfig
from velocity_tpu.camera.annotations import Annotation, load_annotation, find_annotation
from velocity_tpu.geometry.geodesy import lla_to_ecef, ecef_to_ned, ned_to_ecef, ecef_to_lla
from velocity_tpu.ingest.stills import StillsReader
from velocity_tpu.pipeline import report
from velocity_tpu.pipeline.roi import inside_bbox
from velocity_tpu.pipeline.speedest import SpeedEstimator, RunResult
from velocity_tpu.pipeline.tracker import frame_pyramids_jit
from velocity_tpu.solvers.triangulate import nray_intercept_masked_np


class StillsSpeedEstimator(SpeedEstimator):
    """Speed estimation over an ordered JPG burst with EXIF timing/GPS.

    Forces the car-anchored affine prior (TrackerConfig.car_affine): the
    sharp wide-baseline burst has two motion groups, and the background
    dominates global consensus — see the config field's rationale.
    """

    def __init__(self, config: PipelineConfig = PipelineConfig()):
        import dataclasses

        if not config.tracker.car_affine:
            config = dataclasses.replace(
                config,
                tracker=dataclasses.replace(config.tracker, car_affine=True),
            )
        super().__init__(config)

    def run(
        self,
        images: list[str | Path],
        annotation: str | Path | Annotation | None = None,
        verbose: bool = True,
        collect_images: bool = True,
        georegister: bool = True,
    ) -> RunResult:
        cfg = self.config
        want64 = cfg.solver.dtype == "float64" and jax.config.jax_enable_x64
        sdt = jnp.float64 if want64 else jnp.float32

        reader = StillsReader(images, cfg.platform)
        cam = reader.info
        if annotation is None:
            first = Path(images[0])
            ann = load_annotation(
                find_annotation(first, [first.parent.parent / "matlab", first.parent])
            )
        elif isinstance(annotation, Annotation):
            ann = annotation
        else:
            ann = load_annotation(annotation)

        scale = cfg.native_scale
        q = ann.q * scale
        intr = cam.intrinsics(scale=scale).astype(sdt)
        intr_np = (float(intr.fx), float(intr.fy), float(intr.cx), float(intr.cy))
        n = len(reader.paths)
        N = cfg.tracker.max_features

        B = np.zeros((n, 14), np.float64)
        S = np.zeros((n, 9), np.float64)
        track_px = np.full((n, N, 2), np.nan, np.float32)
        proj_px = np.full((n, N, 2), np.nan, np.float32)
        valid_hist = np.zeros((n, N), bool)

        pending = np.zeros(N, bool)  # replenished lanes awaiting triangulation
        key = jax.random.PRNGKey(0)
        t_wall0 = time.time()
        if verbose:
            print(f"Starting image processing on {len(images)} stills ...")
            print(report.header())

        first_gray = last_gray = None
        for i, gray, llat in reader.frames():
            tic = time.time()
            if llat is not None:
                B[i, 9:13] = llat
            B[i, 13] = i
            prev_gray = last_gray
            last_gray = gray
            im_dev = jnp.asarray(gray)

            if i == 0:
                first_gray = gray if collect_images else None
                p, valid, boxa, boxb = self._init_features(gray, q)
                t_np, p3_np, res0 = self._init_geometry(cam, q, p, valid, scale)
                t = jnp.asarray(t_np, sdt)
                p3 = jnp.asarray(p3_np, sdt)
                residuals = res0
                B[0, 0:3] = t_np
                vg = valid.copy()
                vp = valid & inside_bbox(p, boxa)
                pts_dev = jnp.asarray(p, jnp.float32)
                vg_dev = jnp.asarray(vg)
                vp_dev = jnp.asarray(vp)
                pyr_prev, spyr_prev = frame_pyramids_jit(im_dev, cfg.tracker)
                dt = np.nan
                dr = 0.0
                dist = 0.0
                t0_time = B[0, 12]
                p_proj_frame = None
            else:
                key, kf = jax.random.split(key)
                (
                    pyr_prev, spyr_prev,
                    pts_dev, vg_dev, vp_dev,
                    t, residuals, pproj_dev, n2, _T23, _packed,
                ) = self._frame_step_with_fallback(
                    pyr_prev, spyr_prev, im_dev, pts_dev, vg_dev, vp_dev,
                    p3, intr, kf, sdt, prev_gray, gray, t,
                )
                vg = np.asarray(vg_dev)
                vp = np.asarray(vp_dev)
                p_proj_frame = np.asarray(pproj_dev)

                dt = B[i, 12] - B[i - 1, 12]
                tnp = np.asarray(t, np.float64)
                dr = float(np.linalg.norm(tnp + B[0, 0:3] - B[i - 1, 0:3]))
                dist += dr
                B[i, 3:6] = tnp
                B[i, 0:3] = B[0, 0:3] + tnp

            pnp = np.asarray(pts_dev)
            track_px[i, vg] = pnp[vg]
            valid_hist[i] = vg
            if p_proj_frame is not None:
                proj_px[i, vp] = p_proj_frame[vp]

            if i == cfg.msv_frame:
                from velocity_tpu.pipeline.anchor import reanchor

                p3_new, t_abs, res_new = reanchor(
                    cfg, cam, scale, track_px[: i + 1], vg, B,
                    np.asarray(t, np.float64), np.asarray(p3, np.float64),
                    q=np.asarray(q, np.float64),
                )
                if t_abs is not None:
                    B[: i + 1, 0:3] = t_abs
                    B[: i + 1, 3:6] = t_abs - t_abs[0]
                    t = jnp.asarray(t_abs[-1] - t_abs[0], sdt)
                    dist = 0.0
                    for r in range(i + 1):
                        drr = (float(np.linalg.norm(
                            B[r, 0:3] - B[r - 1, 0:3])) if r > 0 else 0.0)
                        dist += drr
                        S[r, 6] = drr
                        S[r, 7] = dist
                        dtr = S[r, 4]
                        S[r, 8] = (drr / dtr * 3.6
                                   if r > 0 and np.isfinite(dtr) and dtr > 0
                                   else np.nan)
                        if res_new is not None:
                            S[r, 3] = res_new[r]
                p3 = jnp.asarray(p3_new, sdt)
                vp = vg.copy()
                vp_dev = jnp.asarray(vp)

            S[i, :] = (
                i, time.time() - tic, float(vg.sum()), float(residuals), dt,
                B[i, 12] - t0_time, dr, dist,
                dr / dt * 3.6 if np.isfinite(dt) and dt > 0 else np.nan,
            )
            if verbose:
                print(report.row(S[i]))

            # replenish after the scale transfer: the ~2 m/frame burst
            # baseline sheds tracks far faster than video (the 12-image GT
            # run decays to single digits without this, and the post-MSV
            # pose solve needs a populated structure). New lanes are TRACKED
            # immediately but join the pose solve (vp) only after N-ray
            # triangulation from real baseline: the plane-seeded depth is
            # provisional, and static-background corners seeded at car depth
            # would otherwise drag the solve toward zero motion.
            if i >= cfg.msv_frame and i < n - 1:
                p_r, vg_r, p3_r, n_new = self._replenish(
                    gray, q, np.asarray(pts_dev), vg,
                    np.asarray(p3, np.float64), np.asarray(t, np.float64),
                    intr_np)
                if n_new:
                    pending |= vg_r & ~vg
                    vg = vg_r
                    pts_dev = jnp.asarray(p_r, jnp.float32)
                    vg_dev = jnp.asarray(vg)
                    p3 = jnp.asarray(p3_r, sdt)
                    track_px[i, vg] = p_r[vg]
                    valid_hist[i] = vg
            pending &= vg
            if i > cfg.msv_frame and pending.any():
                # plausible-depth band around the live solved structure
                tvec_i = np.asarray(t, np.float64)
                z_live = (np.asarray(p3, np.float64)[vp] + tvec_i)[:, 2]
                med = float(np.median(z_live)) if vp.any() else 10.0
                p3_tri, okt = nray_intercept_masked_np(
                    intr_np,
                    track_px[cfg.msv_frame : i + 1],
                    B[cfg.msv_frame : i + 1, 0:3] - B[0, 0:3],
                    valid_hist[cfg.msv_frame : i + 1] & pending[None, :],
                    depth_range=(0.25 * med, 4.0 * med),
                )
                promote = pending & okt
                if promote.any():
                    p3_np2 = np.asarray(p3, np.float64)
                    p3_np2[promote] = p3_tri[promote]
                    p3 = jnp.asarray(p3_np2, sdt)
                    vp = vp | promote
                    vp_dev = jnp.asarray(vp)
                    pending[promote] = False

        wall = time.time() - t_wall0
        if georegister and np.any(B[:, 9] != 0):
            georegister_track(B, yaw_deg=reader.yaw_deg(0))
        if verbose:
            print(report.summary(S))
            print(f"Processed {n:g} images in {wall:.2f}s ({n / wall:.2f}fps)\n")

        return RunResult(
            S=S, B=B, track_px=track_px, proj_px=proj_px, valid=valid_hist,
            plate_box=boxa, roi_box=boxb, camera=cam, config=cfg,
            first_gray=first_gray, last_gray=last_gray if collect_images else None,
            timings={"wall_s": wall, "fps": n / wall},
        )


def georegister_track(B: np.ndarray, yaw_deg: float | None = None):
    """Georegister the SfM track to Earth coordinates (in place).

    Parity with the MATLAB driver (matlab/runExample.m:49-50, 156-159):
      * camera GPS LLA fixes (B[:, 9:12]) -> ECEF -> NED about image 0;
      * true-north camera heading from EXIF GPSImgDirection + magnetic
        declination (2.56 deg, runExample.m:49-50) rotates the camera frame
        into NED (camera axes map to NED by the cam2ned permutation when the
        camera faces north, common.py:159);
      * the SfM car track B[:, 0:3] (camera-0 frame, metric) is rotated into
        NED, hung off image 0's fix, and exported as ECEF (B[:, 6:9]) and LLA
        (B[:, 9:12], replacing the raw GPS input, which is consumed here).

    Returns (cam_ned, car_ned): the cameras' GPS track and the car's SfM
    track, both in the image-0 NED frame — the quantities the MATLAB driver
    plots.
    """
    origin = B[0, 9:12].copy()
    cam_ecef = lla_to_ecef(B[:, 9:12])
    cam_ned = ecef_to_ned(cam_ecef, origin)

    # camera frame -> NED: cam2ned permutation (N=z_cam, E=x_cam, D=y_cam)
    # then heading rotation about Down by the true-north yaw
    perm = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    psi = np.deg2rad(yaw_deg) if yaw_deg is not None else 0.0
    c, s = np.cos(psi), np.sin(psi)
    R_yaw = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    car_ned = (R_yaw @ perm @ B[:, 0:3].T).T  # relative to camera 0
    car_ecef = ned_to_ecef(car_ned, origin)
    B[:, 6:9] = car_ecef
    B[:, 9:12] = ecef_to_lla(car_ecef)
    return cam_ned, car_ned
