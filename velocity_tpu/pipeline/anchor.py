"""Scale-transfer re-anchoring of structure once baseline accumulates.

Two strategies, selected by ``PipelineConfig.anchor``:
- "msv": the reference's active path (fcnMSV1_t, vidExample.py:155-160) —
  multi-view ray-intercept triangulation + GN over the newest camera.
- "ba":  the reference's dormant path (the commented fcnNLS_batch call,
  vidExample.py:157) — windowed bundle adjustment over frames 0..i jointly
  refining structure and the camera track (Schur solver). Identity damping
  keeps the free monocular scale gauge pinned to the plate-anchored init.

Both run host-side in f64 (one-shot per video; triangulation of distant
background features is noise-amplifying).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from velocity_tpu.config import PipelineConfig, BAConfig
from velocity_tpu.solvers.triangulate import msv_refine_translation
from velocity_tpu.solvers.ba import BAProblem
from velocity_tpu.solvers.schur import ba_schur


def reanchor(
    cfg: PipelineConfig,
    cam,
    scale: float,
    track_px: np.ndarray,  # (i+1, N, 2) pixel history, NaN where invalid
    vg: np.ndarray,  # (N,) current global validity
    B: np.ndarray,  # (i+1, 14) car rows (B[:,0:3] positions)
    t_cur: np.ndarray,  # (3,) current frame translation
    p3: np.ndarray,  # (N, 3) current structure
):
    """Return (p3_new, t_new or None) after the scale-transfer refinement."""
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            intr64 = cam.intrinsics(scale=scale).astype(jnp.float64)
            if cfg.anchor == "ba":
                nf = track_px.shape[0]
                # observations: frames x tracks; mask = track valid (tracks
                # alive at frame i were alive in all prior frames)
                pix = np.nan_to_num(track_px.astype(np.float64), nan=0.0)
                mask = np.repeat(vg[None, :], nf, axis=0) & np.isfinite(
                    track_px[..., 0]
                )
                cams0 = np.zeros((nf, 6))
                cams0[:, 0:3] = B[:nf, 0:3] - B[0, 0:3]  # t_j relative
                prob = BAProblem(
                    intr=intr64,
                    pixels=jnp.asarray(pix),
                    mask=jnp.asarray(mask),
                    points0=jnp.asarray(
                        np.where(vg[:, None], p3, np.array([0.0, 0.0, 5.0]))
                    ),
                    cams0=jnp.asarray(cams0),
                )
                # translation-only cameras: the pipeline's motion model holds
                # R = I (vidExample.py:120); free rotations are unidentifiable
                # on these tiny baselines and corrupt the track
                res = ba_schur(prob, cfg.ba, fix_rotations=True)
                p3_new = np.array(p3)
                pts = np.asarray(res.points)
                p3_new[vg] = pts[vg]
                # refined camera track (t_j rows); caller may update B/t
                t_track = np.asarray(res.cams)[:, 0:3]
                return p3_new, t_track
            # default: MSV
            msv = msv_refine_translation(
                intr64,
                jnp.asarray(track_px, jnp.float64),
                jnp.asarray(vg),
                jnp.asarray(B[: track_px.shape[0], 0:3], jnp.float64),
                config=cfg.solver,
            )
            cloud = np.asarray(msv.points) - np.asarray(t_cur, np.float64)
            p3_new = np.array(p3)
            p3_new[vg] = cloud[vg]
            return p3_new, None
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
