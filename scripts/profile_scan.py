"""Compare scan_segment vs sequential eager steps on-device (fetch-forced)."""
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
from velocity_tpu.pipeline.tracker import frame_pyramids_jit, fused_frame_step_pyr
from velocity_tpu.pipeline.scan import scan_segment
from velocity_tpu.ingest.video import VideoReader
from velocity_tpu.camera.annotations import load_annotation
from velocity_tpu.pipeline.speedest import SpeedEstimator
from velocity_tpu.pipeline.roi import inside_bbox

K = 14
run = known_run("IMG_4119")
cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
tc = cfg.tracker

with VideoReader(run.video, cfg.platform) as vr:
    cam = vr.info
    frames = [f.gray for f in vr.prefetch(start=run.start_frame, count=K + 1, step=1)]
ann = load_annotation(run.annotation)
q = ann.q * cfg.native_scale
intr = cam.intrinsics(scale=cfg.native_scale).astype(jnp.float32)
est = SpeedEstimator(cfg)
p, valid, boxa, boxb = est._init_features(frames[0], q)
t0, p3_np, _ = est._init_geometry(cam, q, p, valid, cfg.native_scale)
vp = valid & inside_bbox(p, boxa)

dev_frames = jnp.stack([jnp.asarray(f) for f in frames[1:]])
pyr0, spyr0 = frame_pyramids_jit(jnp.asarray(frames[0]), tc)
pts0 = jnp.asarray(p, jnp.float32)
vg0 = jnp.asarray(valid)
vp0 = jnp.asarray(vp)
p3 = jnp.asarray(p3_np, jnp.float32)
t0d = jnp.asarray(t0, jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(0), K)


def force(x):
    np.asarray(jax.tree.leaves(x)[0])


def timeit(name, fn, reps=5):
    force(fn())
    ts = []
    for _ in range(reps):
        a = time.time()
        force(fn())
        ts.append(time.time() - a)
    print(f"{name:40s} {1e3*np.median(ts):9.1f} ms  ({1e3*min(ts):.1f} min)")


def run_scan():
    carry, outs = scan_segment(dev_frames, pyr0, spyr0, pts0, vg0, vp0, t0d,
                               p3, intr, keys, tc, cfg.solver, jnp.float32,
                               lean=True)
    return outs


def run_eager():
    pyr, spyr = pyr0, spyr0
    pts, vg, vp_, t = pts0, vg0, vp0, t0d
    out = None
    for j in range(K):
        r = fused_frame_step_pyr(pyr, spyr, dev_frames[j], pts, vg, vp_, p3,
                                 intr, keys[j], tc, cfg.solver, jnp.float32, t)
        pyr, spyr, pts, vg, vp_ = r[0], r[1], r[2], r[3], r[4]
        t = r[5]
        out = r[6]
    return out


def run_scan_k(k):
    carry, outs = scan_segment(dev_frames[:k], pyr0, spyr0, pts0, vg0, vp0,
                               t0d, p3, intr, keys[:k], tc, cfg.solver,
                               jnp.float32, lean=True)
    return outs


timeit("scan_segment(6, lean)", lambda: run_scan_k(6))
timeit("scan_segment(8, lean)", lambda: run_scan_k(8))
timeit(f"scan_segment({K} frames, lean)", run_scan)
timeit(f"{K} eager fused steps (1 fetch at end)", run_eager)
