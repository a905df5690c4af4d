"""Decompose the frame-0 Harris+subpix init cost on the real TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from functools import partial
from velocity_tpu.config import PipelineConfig, SolverConfig
from velocity_tpu.pipeline.datasets import known_run
from velocity_tpu.ingest.video import VideoReader
from velocity_tpu.camera.annotations import load_annotation
from velocity_tpu.pipeline.roi import bounding_rect
from velocity_tpu.ops.harris import good_features, corner_subpix, harris_response

run = known_run("IMG_4119")
cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
tc = cfg.tracker
with VideoReader(run.video, cfg.platform) as vr:
    frames = [f.gray for f in vr.prefetch(start=run.start_frame, count=1, step=1)]
ann = load_annotation(run.annotation)
q = ann.q * cfg.native_scale
gray = frames[0]
boxb = bounding_rect(q, gray.shape, border=tc.roi_border)
x0, x1, y0, y1 = (int(v) for v in boxb)
img = jnp.asarray(gray)
print("ROI:", x1 - x0, "x", y1 - y0)


def force(x):
    np.asarray(jax.tree.leaves(x)[0])


def timeit(name, fn, reps=8):
    force(fn())
    ts = []
    for _ in range(reps):
        a = time.time()
        force(fn())
        ts.append(time.time() - a)
    print(f"{name:34s} {1e3*np.median(ts):8.1f} ms")


@partial(jax.jit, static_argnames=("box",))
def resp_only(gray, box):
    x0, x1, y0, y1 = box
    return harris_response(gray[y0:y1, x0:x1], block=tc.harris_block,
                           k=tc.harris_k)[0, 0]


@partial(jax.jit, static_argnames=("box",))
def gf_only(gray, box):
    x0, x1, y0, y1 = box
    c = good_features(gray[y0:y1, x0:x1], max_corners=tc.max_features - 4,
                      quality_level=tc.harris_quality, block=tc.harris_block,
                      k=tc.harris_k)
    return c.points[0]


@partial(jax.jit, static_argnames=("box",))
def full_init(gray, box):
    x0, x1, y0, y1 = box
    roi = gray[y0:y1, x0:x1]
    c = good_features(roi, max_corners=tc.max_features - 4,
                      quality_level=tc.harris_quality, block=tc.harris_block,
                      k=tc.harris_k)
    pts = c.points + jnp.asarray([x0, y0], c.points.dtype)
    refined = corner_subpix(gray, pts, half_win=tc.subpix_window,
                            max_iters=tc.subpix_iters, eps=tc.subpix_eps)
    return refined[0, 0]


timeit("null dispatch+fetch", lambda: (jax.jit(lambda x: x[0, 0])(img),))
timeit("harris response only", lambda: resp_only(img, boxb))
timeit("good_features (resp+NMS+topk)", lambda: gf_only(img, boxb))
timeit("full init (gf+subpix)", lambda: full_init(img, boxb))
