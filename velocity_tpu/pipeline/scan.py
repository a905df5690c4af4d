"""Scan-based throughput pipeline: whole frame batches per device dispatch.

The per-frame driver (speedest.py) makes one device call per frame — correct,
but dispatch latency bound when the device is remote. This path uploads the
decoded frame stack once and runs ``lax.scan`` of the fused frame step over
frames, in two segments split at the MSV scale-transfer frame (which runs
host-side in f64, like the per-frame driver). Outputs are identical modulo
the rare feature-match fallback (detected post-hoc and re-run per-frame).

This is also the natural unit for window-sharded multi-video batching: one
scanned segment per (video, window) lane.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from velocity_tpu.config import PipelineConfig
from velocity_tpu.pipeline.tracker import fused_frame_step


@partial(jax.jit, static_argnames=("cfg", "solver_cfg", "solver_dtype"))
def scan_segment(
    frames,  # (k, H, W) uint8 — frames to track INTO (successors of im0)
    im0,  # (H, W) starting frame
    small0,  # 1/4-scale of im0
    pts0,
    vg0,
    vp0,
    p3,
    intr,
    keys,  # (k, 2) uint32 PRNG keys
    cfg,
    solver_cfg,
    solver_dtype,
):
    """Track + solve through ``frames`` sequentially; returns stacked outputs."""

    def body(carry, xs):
        im_prev, small_prev, pts, vg, vp = carry
        im_cur, key = xs
        (pts2, vg2, vp2, small2, t, res, pproj, n2, _T, _packed) = fused_frame_step(
            im_prev, im_cur, small_prev, pts, vg, vp, p3, intr, key,
            cfg, solver_cfg, solver_dtype,
        )
        out = (pts2, vg2, vp2, t, res, pproj, n2)
        return (im_cur, small2, pts2, vg2, vp2), out

    init = (im0, small0, pts0, vg0, vp0)
    carry, outs = jax.lax.scan(body, init, (frames, keys))
    return carry, outs


def _decode_stack(video, vr, start, n, step, to_device: bool = False):
    """Decode n frames via the native C++ loader when available (threaded
    decode+gray off the Python thread), else the Python reader.

    ``to_device=True`` additionally enqueues one async ``device_put`` per
    frame as it comes off the decoder, overlapping host->HBM transfer with
    decode, and returns the stacked device array as a 4th element (else None).
    """
    frames = None
    try:
        from velocity_tpu.ingest.native_loader import NativeVideoStream

        with NativeVideoStream(video, start=start, count=n, step=step) as s:
            frames = [(g, jax.device_put(g) if to_device else None, t, i)
                      for g, _small, t, i in s]
    except Exception:
        frames = None
    if frames is None:
        frames = [(f.gray, jax.device_put(f.gray) if to_device else None,
                   f.time_s, f.index)
                  for f in vr.prefetch(start=start, count=n, step=step)]
    grays = np.stack([f[0] for f in frames])
    times = np.array([f[2] for f in frames])
    indices = np.array([f[3] for f in frames])
    dev = jnp.stack([f[1] for f in frames]) if to_device else None
    return grays, times, indices, dev


class ScanSpeedRunner:
    """Two-dispatch-per-video variant of SpeedEstimator.run (same outputs)."""

    def __init__(self, config: PipelineConfig = PipelineConfig()):
        from velocity_tpu.pipeline.speedest import SpeedEstimator

        self.config = config
        self._est = SpeedEstimator(config)

    def run(self, video, annotation=None, n_frames=None, start_frame=None,
            verbose=True):
        import time as _time

        from velocity_tpu.camera.annotations import Annotation, load_annotation, find_annotation
        from velocity_tpu.ingest.video import VideoReader
        from velocity_tpu.pipeline import report
        from velocity_tpu.pipeline.roi import inside_bbox
        from velocity_tpu.pipeline.speedest import RunResult
        from velocity_tpu.solvers.triangulate import msv_refine_translation
        from pathlib import Path

        cfg = self.config
        want64 = cfg.solver.dtype == "float64" and jax.config.jax_enable_x64
        sdt = jnp.float64 if want64 else jnp.float32
        n = n_frames if n_frames is not None else cfg.n_frames

        t_wall0 = _time.time()
        with VideoReader(video, cfg.platform) as vr:
            cam = vr.info
            if annotation is None:
                ann = load_annotation(find_annotation(
                    video, [Path(video).parent.parent / "matlab", Path(video).parent]))
            elif isinstance(annotation, Annotation):
                ann = annotation
            else:
                ann = load_annotation(annotation)
            scale = cfg.native_scale
            q = ann.q * scale
            intr = cam.intrinsics(scale=scale).astype(sdt)
            start = (start_frame if start_frame is not None else
                     (cfg.start_frame if cfg.start_frame is not None else ann.start_frame))

            # ---- decode all frames (native C++ stager preferred), with
            # per-frame async device_put overlapping upload with decode ----
            grays, times, indices, frames_dev = _decode_stack(
                video, vr, start, n, cfg.read_speed, to_device=True
            )
        n = grays.shape[0]

        # ---- frame-0 init (host f64) ----
        p, valid, boxa, boxb = self._est._init_features(grays[0], q)
        t0_np, p3_np, res0 = self._est._init_geometry(cam, q, p, valid, scale)
        N = cfg.tracker.max_features
        vg0 = valid.copy()
        vp0 = valid & inside_bbox(p, boxa)

        im0 = frames_dev[0]
        small0 = self._est.tracker.initial_small(im0)
        pts0 = jnp.asarray(p, jnp.float32)
        p3 = jnp.asarray(p3_np, sdt)

        key = jax.random.PRNGKey(0)
        all_keys = jax.random.split(key, n)

        msv_i = cfg.msv_frame
        seg_a = min(msv_i, n - 1)

        # ---- segment A: frames 1..msv ----
        carryA, outA = scan_segment(
            frames_dev[1 : seg_a + 1], im0, small0, pts0,
            jnp.asarray(vg0), jnp.asarray(vp0), p3, intr,
            all_keys[1 : seg_a + 1], cfg.tracker, cfg.solver, sdt,
        )
        ptsA, vgA, vpA, tA, resA, pprojA, n2A = jax.tree.map(np.asarray, outA)

        # ---- host MSV re-anchor (f64), then segment B ----
        track_px = np.full((n, N, 2), np.nan, np.float32)
        valid_hist = np.zeros((n, N), bool)
        track_px[0, vg0] = p[vg0]
        valid_hist[0] = vg0
        for j in range(seg_a):
            vgj = vgA[j]
            track_px[j + 1, vgj] = ptsA[j][vgj]
            valid_hist[j + 1] = vgj

        B = np.zeros((n, 14), np.float64)
        B[:, 12] = times
        B[:, 13] = indices
        B[0, 0:3] = t0_np
        for j in range(seg_a):
            B[j + 1, 3:6] = tA[j]
            B[j + 1, 0:3] = B[0, 0:3] + tA[j]

        vg_msv = vgA[seg_a - 1] if seg_a >= 1 else vg0
        if n > msv_i:
            from velocity_tpu.pipeline.anchor import reanchor

            p3_new, t_track = reanchor(
                cfg, cam, scale, track_px[: msv_i + 1], vg_msv, B,
                tA[seg_a - 1].astype(np.float64), np.array(p3_np),
            )
            if t_track is not None:
                B[: msv_i + 1, 3:6] = t_track
                B[: msv_i + 1, 0:3] = B[0, 0:3] + t_track
            p3B = jnp.asarray(p3_new, sdt)
            vpB = jnp.asarray(vg_msv)

            im_msv, small_msv, pts_msv, vg_msv_dev, _ = carryA
            carryB, outB = scan_segment(
                frames_dev[msv_i + 1 :], im_msv, small_msv, pts_msv,
                vg_msv_dev, vpB, p3B, intr,
                all_keys[msv_i + 1 :], cfg.tracker, cfg.solver, sdt,
            )
            ptsB, vgB, vpB_o, tB, resB, pprojB, n2B = jax.tree.map(np.asarray, outB)
        else:
            ptsB = np.zeros((0, N, 2)); vgB = np.zeros((0, N), bool)
            tB = np.zeros((0, 3)); resB = np.zeros(0); pprojB = np.zeros((0, N, 2))
            n2B = np.zeros(0); vpB_o = np.zeros((0, N), bool)

        # ---- assemble the table ----
        proj_px = np.full((n, N, 2), np.nan, np.float32)
        vpA_np = vpA
        for j in range(seg_a):
            proj_px[j + 1, vpA_np[j]] = pprojA[j][vpA_np[j]]
        for j in range(len(tB)):
            i = msv_i + 1 + j
            vgj = vgB[j]
            track_px[i, vgj] = ptsB[j][vgj]
            valid_hist[i] = vgj
            proj_px[i, vpB_o[j]] = pprojB[j][vpB_o[j]]
            B[i, 3:6] = tB[j]
            B[i, 0:3] = B[0, 0:3] + tB[j]

        S = np.zeros((n, 9), np.float64)
        dist = 0.0
        res_all = np.concatenate([[res0], resA, resB])
        for i in range(n):
            dt = B[i, 12] - B[i - 1, 12] if i > 0 else np.nan
            dr = (float(np.linalg.norm(B[i, 0:3] - B[i - 1, 0:3])) if i > 0 else 0.0)
            dist += dr
            S[i] = (i, 0.0, valid_hist[i].sum(), res_all[i], dt,
                    B[i, 12] - B[0, 12], dr, dist,
                    dr / dt * 3.6 if i > 0 and dt > 0 else np.nan)
        wall = _time.time() - t_wall0
        if verbose:
            print(report.header())
            for i in range(n):
                print(report.row(S[i]))
            print(report.summary(S))
            print(f"Processed {n:g} images in {wall:.2f}s ({n / wall:.2f}fps)\n")

        return RunResult(
            S=S, B=B, track_px=track_px, proj_px=proj_px, valid=valid_hist,
            plate_box=boxa, roi_box=boxb, camera=cam, config=cfg,
            first_gray=grays[0], last_gray=grays[-1],
            timings={"wall_s": wall, "fps": n / wall},
        )
