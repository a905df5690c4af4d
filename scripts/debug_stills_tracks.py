"""Diagnose stills tracker collapse: per-stage survivor counts + cv2 oracle."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from velocity_tpu.config import PipelineConfig, SolverConfig
from velocity_tpu.pipeline.stills import StillsSpeedEstimator
from velocity_tpu.pipeline.tracker import (
    frame_pyramids_jit, _track_stages_p, _track_fine_p)
from velocity_tpu.camera.annotations import load_annotation
from velocity_tpu.ingest.stills import StillsReader
from pathlib import Path
import cv2

DATA = Path("/root/reference/data")
STILLS = sorted(DATA.glob("IMG_41[2-3][0-9].JPG"))
ann = load_annotation(DATA.parent / "matlab" / "IMG_4122.JPG.mat")

cfg = PipelineConfig(native_scale=1.0, solver=SolverConfig(dtype="float32"))
est = StillsSpeedEstimator(cfg)
reader = StillsReader(STILLS[:3], cfg.platform)

frames = [g for _i, g, _l in reader.frames()]
g0, g1 = frames[0], frames[1]
q = ann.q * 1.0
p, valid, boxa, boxb = est._init_features(g0, q)
print("init valid:", valid.sum())

tc = cfg.tracker
pyr0, spyr0 = frame_pyramids_jit(jnp.asarray(g0), tc)
pyr1, spyr1 = frame_pyramids_jit(jnp.asarray(g1), tc)
pts = jnp.asarray(p, jnp.float32)
vg = jnp.asarray(valid)
key = jax.random.PRNGKey(0)

# ---- stage by stage (mirror _track_stages_p internals) ----
from velocity_tpu.pipeline.tracker import _lk_impls, _pyr_kw
from velocity_tpu.ops.ransac import estimate_affine_ransac
lk_pyr, lk_fb = _lk_impls(tc)
scale = tc.coarse_scale
lk1 = tc.lk_coarse
r1 = lk_pyr(spyr0[0], spyr1[0], pts * scale, win=lk1.window,
            max_level=lk1.max_level, iters=lk1.max_iters, eps=lk1.eps,
            **_pyr_kw(tc, spyr0, spyr1))
v1 = vg & r1.status
print("stage1 LK survivors:", int(v1.sum()))
k1 = jax.random.split(key)[1]
ransac1 = estimate_affine_ransac(pts, r1.points / scale, mask=v1, key=k1,
                                 trials=tc.ransac_trials,
                                 threshold=tc.ransac_threshold)
v1r = v1 & ransac1.inliers
print("stage1 after RANSAC:", int(v1r.sum()), "affine:", np.asarray(ransac1.M))
m1 = v1r.astype(jnp.float32)[:, None]
n1 = jnp.maximum(jnp.sum(v1r), 1)
mean_shift = jnp.sum((r1.points / scale - pts) * m1, axis=0) / n1
print("mean shift px:", np.asarray(mean_shift))
shift_int = jnp.trunc(mean_shift)
r2 = lk_fb(pyr0[0], pyr1[0], pts, guess=pts + shift_int,
           fb_threshold=tc.fb_threshold_coarse, win=lk1.window,
           max_level=lk1.max_level, iters=lk1.max_iters, eps=lk1.eps,
           **_pyr_kw(tc, pyr0, pyr1))
v2 = vg & r2.status
print("stage2 survivors:", int(v2.sum()))
k2 = jax.random.split(k1)[1]
ransac2 = estimate_affine_ransac(pts, r2.points, mask=v2, key=k2,
                                 trials=tc.ransac_trials,
                                 threshold=tc.ransac_threshold)
T23 = ransac2.M
print("stage2 affine:", np.asarray(T23))
p3_, v3_ = _track_fine_p(pyr0, pyr1, pts, vg, T23, tc)
print("stage3 survivors:", int(v3_.sum()))

# ---- cv2 oracle: the reference KLTmain semantics on the same pair ----
pnp = p[valid].astype(np.float32)
im0s = cv2.resize(g0, (0, 0), fx=0.25, fy=0.25, interpolation=cv2.INTER_NEAREST)
im1s = cv2.resize(g1, (0, 0), fx=0.25, fy=0.25, interpolation=cv2.INTER_NEAREST)
lkc = dict(winSize=(15, 15), maxLevel=4,
           criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.1))
pc, st, err = cv2.calcOpticalFlowPyrLK(im0s, im1s, pnp * 0.25, None, **lkc)
print("cv2 stage1 survivors:", int(st.sum()), "/", len(pnp))
stb = st.ravel() > 0
M, inl = cv2.estimateAffine2D(pnp[stb] * 0.25, pc[stb], ransacReprojThreshold=3.0)
print("cv2 stage1 RANSAC inliers:", int(inl.sum()))
# stage2: translation re-track full-res, fb gate 1
sh = (pc[stb] / 0.25 - pnp[stb]).mean(axis=0).astype(int)
p2g = (pnp + sh).astype(np.float32)
pf, st2, _ = cv2.calcOpticalFlowPyrLK(g0, g1, pnp, p2g.copy(),
                                      flags=cv2.OPTFLOW_USE_INITIAL_FLOW, **lkc)
pb, st2b, _ = cv2.calcOpticalFlowPyrLK(g1, g0, pf, pnp.copy(),
                                       flags=cv2.OPTFLOW_USE_INITIAL_FLOW, **lkc)
fbe = np.linalg.norm(pb - pnp, axis=1)
ok2 = (st2.ravel() > 0) & (st2b.ravel() > 0) & (fbe < 1.0)
print("cv2 stage2 survivors:", int(ok2.sum()))
M2, inl2 = cv2.estimateAffine2D(pnp[ok2], pf[ok2], ransacReprojThreshold=3.0)
print("cv2 stage2 affine:", M2, "inliers:", int(inl2.sum()))
# stage3: fine 51x51 on warped ROI analog -> use remap like the reference
lkf = dict(winSize=(51, 51), maxLevel=0,
           criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.001))
H, W = g0.shape
yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                     np.arange(W, dtype=np.float32), indexing="ij")
mx = M2[0, 0] * xx + M2[0, 1] * yy + M2[0, 2]
my = M2[1, 0] * xx + M2[1, 1] * yy + M2[1, 2]
g1w = cv2.remap(g1, mx.astype(np.float32), my.astype(np.float32), cv2.INTER_LINEAR)
pfw, st3, _ = cv2.calcOpticalFlowPyrLK(g0, g1w, pnp, None, **lkf)
pbw, st3b, _ = cv2.calcOpticalFlowPyrLK(g1w, g0, pfw, None, **lkf)
fbe3 = np.linalg.norm(pbw - pnp, axis=1)
ok3 = (st3.ravel() > 0) & (st3b.ravel() > 0) & (fbe3 < 0.3)
print("cv2 stage3 survivors:", int(ok3.sum()))
