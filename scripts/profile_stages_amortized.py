"""Amortized per-stage device timing (fori-loop x10, fetch once) on TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from velocity_tpu.config import PipelineConfig, SolverConfig
from velocity_tpu.pipeline.datasets import known_run
from velocity_tpu.pipeline.tracker import (
    frame_pyramids_jit, frame_pyramids, _track_stages_p, _track_fine_p)
from velocity_tpu.ingest.video import VideoReader
from velocity_tpu.camera.annotations import load_annotation
from velocity_tpu.pipeline.speedest import SpeedEstimator
from velocity_tpu.pipeline.roi import inside_bbox
from velocity_tpu.solvers.pose import estimate_world_camera_pose

run = known_run("IMG_4119")
cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
tc = cfg.tracker
with VideoReader(run.video, cfg.platform) as vr:
    cam = vr.info
    frames = [f.gray for f in vr.prefetch(start=run.start_frame, count=2, step=1)]
ann = load_annotation(run.annotation)
q = ann.q * cfg.native_scale
intr = cam.intrinsics(scale=cfg.native_scale).astype(jnp.float32)
est = SpeedEstimator(cfg)
p, valid, boxa, boxb = est._init_features(frames[0], q)
t0, p3_np, _ = est._init_geometry(cam, q, p, valid, cfg.native_scale)
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
t0d = jnp.asarray(t0, jnp.float32)
REPS = 10


def timed(name, make_fn):
    f = jax.jit(make_fn)
    r = f(pts)
    np.asarray(r)
    ts = []
    for _ in range(5):
        a = time.time()
        np.asarray(f(pts))
        ts.append(time.time() - a)
    print(f"{name:34s} {1e3*np.median(ts)/REPS:8.2f} ms/iter "
          f"(total {1e3*np.median(ts):6.1f})")


def mk_pyr(p_in):
    def body(i, acc):
        pyr, spyr = frame_pyramids(im1 + acc * 1e-9, tc)
        return acc + pyr[0][0, 0] * 1e-9
    return jax.lax.fori_loop(0, REPS, body, p_in[0, 0])


def mk_stages12(p_in):
    def body(i, acc):
        T23, n2, _ = _track_stages_p(pyr0, pyr1, spyr0, spyr1,
                                     p_in + acc * 1e-9, vg_d, key, tc)
        return acc + T23[0, 2] * 1e-9
    return jax.lax.fori_loop(0, REPS, body, p_in[0, 0])


T23c = jnp.asarray(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32))


def mk_fine(p_in):
    def body(i, acc):
        pw, vw = _track_fine_p(pyr0, pyr1, p_in + acc * 1e-9, vg_d, T23c, tc)
        return acc + pw[0, 0] * 1e-9
    return jax.lax.fori_loop(0, REPS, body, p_in[0, 0])


def mk_pose(p_in):
    def body(i, acc):
        pose = estimate_world_camera_pose(
            intr, p_in + acc * 1e-9, p3, t0=t0d, R0=jnp.eye(3, dtype=jnp.float32),
            find_R=False, mask=vp_d, config=cfg.solver)
        return acc + pose.t[0] * 1e-9
    return jax.lax.fori_loop(0, REPS, body, p_in[0, 0])


timed("pyramids (full+small)", mk_pyr)
timed("stages 1+2 (2xLK15 fb + ransac)", mk_stages12)
timed("stage 3 fine (win51 warped fb)", mk_fine)
timed("pose LM30 (+robust pass)", mk_pose)
