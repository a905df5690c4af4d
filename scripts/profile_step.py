"""Per-stage timing of the fused frame step on the real TPU (fetch-forced).

Usage: python scripts/profile_step.py  (from the repo root; axon TPU).
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from velocity_tpu.config import PipelineConfig, SolverConfig
from velocity_tpu.pipeline.datasets import known_run
from velocity_tpu.pipeline.tracker import (
    frame_pyramids_jit, fused_frame_step_pyr, _track_stages_p, _track_fine_p,
    _lk_impls, _pyr_kw)
from velocity_tpu.ingest.video import VideoReader
from velocity_tpu.camera.annotations import load_annotation
from velocity_tpu.pipeline.speedest import SpeedEstimator
from functools import partial

run = known_run("IMG_4119")
cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
tc = cfg.tracker

with VideoReader(run.video, cfg.platform) as vr:
    cam = vr.info
    frames = [f.gray for f in vr.prefetch(start=run.start_frame, count=8, step=1)]
ann = load_annotation(run.annotation)
q = ann.q * cfg.native_scale
intr = cam.intrinsics(scale=cfg.native_scale).astype(jnp.float32)

est = SpeedEstimator(cfg)
p, valid, boxa, boxb = est._init_features(frames[0], q)
t0, p3_np, _ = est._init_geometry(cam, q, p, valid, cfg.native_scale)
from velocity_tpu.pipeline.roi import inside_bbox
vp = valid & inside_bbox(p, boxa)

im0 = jnp.asarray(frames[0])
im1 = jnp.asarray(frames[1])
pyr0, spyr0 = frame_pyramids_jit(im0, tc)
pyr1, spyr1 = frame_pyramids_jit(im1, tc)
pts = jnp.asarray(p, jnp.float32)
vg_d = jnp.asarray(valid)
vp_d = jnp.asarray(vp)
p3 = jnp.asarray(p3_np, jnp.float32)
key = jax.random.PRNGKey(1)
t0_d = jnp.asarray(t0, jnp.float32)


def timeit(name, fn, reps=10):
    r = fn()
    _ = np.asarray(jax.tree.leaves(r)[0])  # force
    ts = []
    for _i in range(reps):
        a = time.time()
        r = fn()
        _ = np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.time() - a)
    print(f"{name:32s} {1e3*np.median(ts):8.2f} ms")
    return r


@partial(jax.jit, static_argnames=("cfg",))
def stages12(pyr0, pyr1, spyr0, spyr1, pts, vg, key, cfg):
    return _track_stages_p(pyr0, pyr1, spyr0, spyr1, pts, vg, key, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def fine3(pyr0, pyr1, pts, vg, T23, cfg):
    return _track_fine_p(pyr0, pyr1, pts, vg, T23, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def s1_only(spyr0, spyr1, pts, vg, cfg):
    lk_pyr, _ = _lk_impls(cfg)
    lk1 = cfg.lk_coarse
    r1 = lk_pyr(spyr0[0], spyr1[0], pts * cfg.coarse_scale, win=lk1.window,
                max_level=lk1.max_level, iters=lk1.max_iters, eps=lk1.eps,
                **_pyr_kw(cfg, spyr0, spyr1))
    return r1.points


@partial(jax.jit, static_argnames=("cfg",))
def s2_only(pyr0, pyr1, pts, vg, cfg):
    _, lk_fb = _lk_impls(cfg)
    lk1 = cfg.lk_coarse
    r2 = lk_fb(pyr0[0], pyr1[0], pts, guess=pts,
               fb_threshold=cfg.fb_threshold_coarse, win=lk1.window,
               max_level=lk1.max_level, iters=lk1.max_iters, eps=lk1.eps,
               **_pyr_kw(cfg, pyr0, pyr1))
    return r2.points


from velocity_tpu.solvers.pose import estimate_world_camera_pose


@partial(jax.jit, static_argnames=("scfg",))
def pose_only(pts, p3, vp, t0, scfg):
    pose = estimate_world_camera_pose(
        intr, pts, p3, t0=t0, R0=jnp.eye(3, jnp.float32), find_R=False,
        mask=vp, config=scfg)
    return pose.t


timeit("pyramids(frame)", lambda: frame_pyramids_jit(im1, tc)[0][0])
timeit("full fused step", lambda: fused_frame_step_pyr(
    pyr0, spyr0, im1, pts, vg_d, vp_d, p3, intr, key, tc, cfg.solver,
    jnp.float32, t0_d)[4])
timeit("stages 1+2 (+ransac)", lambda: stages12(
    pyr0, pyr1, spyr0, spyr1, pts, vg_d, key, tc)[0])
timeit("stage1 LK only", lambda: s1_only(spyr0, spyr1, pts, vg_d, tc))
timeit("stage2 LK fb only", lambda: s2_only(pyr0, pyr1, pts, vg_d, tc))
T23 = jnp.asarray(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32))
timeit("stage3 fine fb (warped)", lambda: fine3(pyr0, pyr1, pts, vg_d, T23, tc)[0])
timeit("pose LM30", lambda: pose_only(pts.astype(jnp.float32), p3, vp_d,
                                      t0_d, cfg.solver))
