"""Extended north-star benchmarks (SURVEY.md §6, BASELINE.json configs 3-5).

Measures, on the real device:
  1. BA ms/iter on a real IMG_4119 track window (dense vs Schur),
  2. roofline/utilization estimates for the hot kernels (lanes-LK sampling,
     Schur reduction, pyramid matmul),
  3. point-sharded BA scaling on the 8-virtual-device CPU mesh (subprocess;
     this container has ONE physical TPU chip — the mesh rows validate the
     sharded code path and communication structure, not real-chip speedup),
and writes everything to BENCH_EXTENDED.json (one row per metric).

Timing method: each solver runs K_hi and K_lo forced iterations inside one
jit (tol=0 disables early exit); ms/iter = (t_hi - t_lo)/(K_hi - K_lo),
which cancels dispatch/fetch overhead (~30 ms on the tunneled TPU).

v5e public peaks used for utilization: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_HBM_GBS = 819.0

N_FRAMES = 20
CAPACITY = 1024


def _enable_compile_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _fetch_time(fn, *args):
    """Wall time of fn(*args) forcing a real D2H fetch of the first leaf."""
    import jax

    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.time() - t0)
    return min(ts)


def real_problem():
    """BAProblem from an actual IMG_4119 20-frame tracked window."""
    import jax.numpy as jnp
    from velocity_tpu.config import PipelineConfig, SolverConfig
    from velocity_tpu.pipeline.datasets import known_run
    from velocity_tpu.pipeline.scan import ScanSpeedRunner
    from velocity_tpu.solvers.ba import BAProblem
    from velocity_tpu.solvers.triangulate import nray_intercept
    from velocity_tpu.geometry.projection import pixel_to_unit_ray

    run = known_run("IMG_4119")
    cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
    res = ScanSpeedRunner(cfg).run(
        run.video, annotation=run.annotation, start_frame=run.start_frame,
        n_frames=N_FRAMES, verbose=False, lean=False,
    )
    valid_all = res.valid.all(axis=0)  # tracks visible in every frame
    n_real = int(valid_all.sum())
    intr = res.camera.intrinsics(scale=cfg.native_scale).astype(jnp.float32)

    pix = np.zeros((N_FRAMES, CAPACITY, 2), np.float32)
    mask = np.zeros((N_FRAMES, CAPACITY), bool)
    pix[:, :, :] = 0.0
    sel = np.where(valid_all)[0]
    pix[:, : len(sel)] = res.track_px[:, sel]
    mask[:, : len(sel)] = True

    cams = np.zeros((N_FRAMES, 6), np.float32)
    cams[:, 0:3] = res.B[:, 0:3] - res.B[0, 0:3]  # camera-0-pinned translations

    # initial cloud: N-ray triangulation of each track from the real cameras
    rays = np.asarray(
        pixel_to_unit_ray(intr, jnp.asarray(pix.reshape(-1, 2)))
    ).reshape(N_FRAMES, CAPACITY, 3)
    pts0 = np.asarray(
        nray_intercept(jnp.asarray(-cams[:, 0:3]), jnp.asarray(rays))
    )
    lane_real = (np.arange(CAPACITY) < len(sel))[:, None]
    pts0 = np.where(
        np.isfinite(pts0) & (np.abs(pts0) < 1e4).all(axis=1, keepdims=True)
        & lane_real, pts0, np.array([0.0, 0.0, 8.0]),
    ).astype(np.float32)

    prob = BAProblem(
        intr=intr,
        pixels=jnp.asarray(pix),
        mask=jnp.asarray(mask),
        points0=jnp.asarray(pts0, jnp.float32),
        cams0=jnp.asarray(cams),
    )
    return prob, n_real


def bench_ba_rows(prob, n_real):
    import jax
    from functools import partial
    from velocity_tpu.config import BAConfig
    from velocity_tpu.solvers.ba import ba_dense
    from velocity_tpu.solvers.schur import ba_schur

    rows = []
    nc, nt = prob.pixels.shape[0], prob.points0.shape[0]

    for name, solver in (("dense", ba_dense), ("schur", ba_schur)):
        if name == "dense" and nt > 512:
            # dense forms the full (nt*3+6(nc-1))^2 system: ~9.4e9 f32 at
            # capacity 1024 — measure it at the real track count instead
            sel = slice(0, 256)
            p = prob._replace(
                pixels=prob.pixels[:, sel], mask=prob.mask[:, sel],
                points0=prob.points0[sel],
            )
            label_nt = 256
        else:
            p = prob
            label_nt = nt
        f_lo = jax.jit(partial(solver, config=BAConfig(max_iters=2, tol=0.0)))
        f_hi = jax.jit(partial(solver, config=BAConfig(max_iters=12, tol=0.0)))
        t_lo = _fetch_time(f_lo, p)
        t_hi = _fetch_time(f_hi, p)
        ms = (t_hi - t_lo) / 10.0 * 1000.0
        rows.append({
            "metric": f"BA ms/iter ({name}, real IMG_4119 window, "
                      f"nc={nc}, nt={label_nt}, {n_real} real tracks)",
            "value": round(ms, 3), "unit": "ms/iter",
        })
        if name == "schur":
            # utilization: S-assembly dominates: nc^2*nt*216 + blocks nc*nt*500
            flops = nc * nc * label_nt * 216 + nc * label_nt * 500 + (6 * nc) ** 3
            rows.append({
                "metric": "Schur iteration utilization (model FLOPs / v5e bf16 peak)",
                "value": round(flops / (ms / 1e3) / V5E_PEAK_BF16 * 100, 4),
                "unit": "% MFU",
                "model_mflops": round(flops / 1e6, 1),
                "note": "a single nc=20 window is ~0.1 GFLOP/iter - far too"
                        " small to fill the MXU; per-chip utilization at this"
                        " shape is dispatch/latency-bound by construction."
                        " See the batched-windows row for the shape the"
                        " long-video driver actually runs.",
            })
    return rows


def bench_batched_schur_rows(prob, n_real):
    """Schur BA batched over nw windows on ONE chip (the windowed_ba shape
    the long-video driver runs): per-iteration wall amortizes across windows,
    which is where the per-chip utilization becomes real."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from velocity_tpu.config import BAConfig
    from velocity_tpu.parallel.mesh import make_mesh
    from velocity_tpu.parallel.windows import windowed_ba

    nw = 8
    nc, nt = prob.pixels.shape[0], prob.points0.shape[0]
    pix = jnp.broadcast_to(prob.pixels[None], (nw,) + prob.pixels.shape)
    msk = jnp.broadcast_to(prob.mask[None], (nw,) + prob.mask.shape)
    pts0 = jnp.broadcast_to(prob.points0[None], (nw,) + prob.points0.shape)
    cams0 = jnp.broadcast_to(prob.cams0[None], (nw,) + prob.cams0.shape)
    mesh = make_mesh({"window": 1, "point": 1},
                     devices=np.array(jax.devices()[:1]).reshape(1, 1))

    # The tunnel's per-dispatch jitter (hundreds of ms) swamps any hi-lo
    # subtraction at these problem sizes, so amortize: 20 full solves inside
    # ONE jit via fori_loop, each data-dependent on the last (defeats
    # loop-invariant hoisting), one fetch at the end.
    REPS = 20
    cfgw = BAConfig(max_iters=6, tol=0.0)

    def batch_loop(p0):
        def body(_i, acc):
            p = p0 + acc * 1e-12
            _pts, camsR, _it = windowed_ba(
                pix, msk, p, cams0, prob.intr, mesh, config=cfgw,
                fix_rotations=True, pin_tracks=4)
            return acc + camsR[0, 1, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    import jax as _jax

    f = _jax.jit(batch_loop)
    t_total = _fetch_time(f, pts0)
    t_null = _fetch_time(_jax.jit(lambda p: p[0, 0, 0]), pts0)
    one = windowed_ba(pix, msk, pts0, cams0, prob.intr, mesh, config=cfgw,
                      fix_rotations=True, pin_tracks=4)
    iters_hi = int(np.asarray(one[2]).ravel()[0])
    ms = max(t_total - t_null, 1e-9) / REPS / max(iters_hi, 1) * 1000.0
    flops = nw * (nc * nc * nt * 216 + nc * nt * 500 + (6 * nc) ** 3)
    delta = t_total - t_null
    return [{
        "metric": f"batched Schur BA ms/iter ({nw} windows x nc={nc}, "
                  f"nt={nt}, one chip - the windowed_ba serving shape)",
        "value": round(ms, 3), "unit": "ms/iter (all windows)",
        "ms_per_window_iter": round(ms / nw, 3),
        "iterations_per_solve": iters_hi,
        "amortized_solves": REPS,
        "mfu_pct_bf16peak": (round(flops / ms * 1e3 / V5E_PEAK_BF16 * 100, 3)
                             if delta >= 0.05 else None),
        "noise_dominated": bool(delta < 0.05),
        "note": "honest conclusion: even batched 8-wide, per-chip MFU stays"
                " <0.1% - the product's BA shapes (~0.1 GFLOP/iter) are"
                " latency-bound on a 197 TFLOP/s chip in EVERY configuration."
                " The operative metric is absolute time: BA costs 0.2-1.5"
                " ms/iter, i.e. a full 6-iter window refine is <10 ms next to"
                " ~30 ms/frame tracking, and the roofline story for this"
                " framework lives in the tracker kernels (rows below).",
    }]


def bench_kernel_rows():
    """Roofline rows for the tracker's hot kernels."""
    import jax
    import jax.numpy as jnp
    from velocity_tpu.ops import lk_lanes as L
    from velocity_tpu.ops.pyramid import build_pyramid

    rows = []
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1080, 1920)).astype(np.float32))

    # ---- pyramid build (MXU matmuls) ----
    def pyr10(x):
        def body(i, acc):
            p = build_pyramid(x + acc * 1e-9, 4)
            return acc + p[4][0, 0]
        return jax.lax.fori_loop(0, 10, body, 0.0)

    f = jax.jit(pyr10)
    t = _fetch_time(f, img)
    t1 = _fetch_time(jax.jit(lambda x: x.sum()), img)  # overhead proxy
    per = max((t - t1) / 10.0, 1e-6)
    flops = 0
    H, W = 1080, 1920
    for _ in range(4):
        h2, w2 = (H + 1) // 2, (W + 1) // 2
        flops += 2 * h2 * H * W + 2 * h2 * W * w2
        H, W = h2, w2
    rows.append({
        "metric": "5-level 1080p Gaussian pyramid (matmul form)",
        "value": round(per * 1e3, 3), "unit": "ms",
        "achieved_tflops": round(flops / per / 1e12, 2),
        "mfu_pct_bf16peak": round(flops / per / V5E_PEAK_BF16 * 100, 2),
    })

    # ---- fused LK iteration block (the Pallas kernel the tracker runs) ----
    from velocity_tpu.ops.lk_block_pallas import lk_block

    N, P, win, taps = 1024, 24, 15, 8
    slab = jnp.asarray(rng.random((P, P, N)).astype(np.float32) * 255)
    Ipw = jnp.asarray(rng.random((win, win, N)).astype(np.float32) * 255)
    gxw = jnp.asarray(rng.normal(0, 20, (win, win, N)).astype(np.float32))
    gyw = jnp.asarray(rng.normal(0, 20, (win, win, N)).astype(np.float32))
    a11 = jnp.sum(gxw * gxw, axis=(0, 1)); a12 = jnp.sum(gxw * gyw, axis=(0, 1))
    a22 = jnp.sum(gyw * gyw, axis=(0, 1))
    inv_det = 1.0 / (a11 * a22 - a12 * a12)
    vecN = jnp.zeros(N, jnp.float32)
    pts2 = jnp.full((2, N), 10.0, jnp.float32)

    def blk_loop(s):
        def body(i, carry):
            p, d, pd = carry
            return lk_block(s, Ipw, gxw, gyw, a11, a12, a22, inv_det,
                            vecN + 3.0, vecN + 3.0, vecN + 1.0, p, vecN, pd,
                            i * 0, win=win, n_taps=taps, cubic=False,
                            eps=1e-9, Wd=1920, Hd=1080)
        p, d, pd = jax.lax.fori_loop(
            0, 20, body, (pts2, vecN, jnp.zeros((2, N), jnp.float32)))
        return p[0, 0]

    t = _fetch_time(jax.jit(blk_loop), slab)
    t0 = _fetch_time(jax.jit(lambda s: s[0, 0, 0]), slab)
    per = max((t - t0) / 20.0, 1e-6)  # one 5-iteration block
    flops = 5 * (2 * taps * win * P * N * 2 + 2 * taps * win * win * N * 2)
    rows.append({
        "metric": "fused LK block kernel (5 iters, win15, 1024 pts)",
        "value": round(per * 1e3, 4), "unit": "ms/block",
        "achieved_gflops": round(flops / per / 1e9, 1),
    })

    # ---- slab extraction (DMA kernel) ----
    from velocity_tpu.ops.slab_pallas import extract_slabs_dma, pad_aligned, use_pallas
    if use_pallas():
        imgp = pad_aligned(img, 24)
        Hp, Wp = imgp.shape
        cx = jnp.asarray(rng.integers(0, Wp - 24, N).astype(np.int32))
        cy = jnp.asarray(rng.integers(0, Hp - 24, N).astype(np.int32))

        def ex10(ip, cxx, cyy):
            def body(i, acc):
                s = extract_slabs_dma(ip, cxx, cyy + 8 * (i % 2), 24)
                return acc + s[0, 0, 0]
            return jax.lax.fori_loop(0, 10, body, 0.0)

        t = _fetch_time(jax.jit(ex10), imgp, cx, cy)
        t0 = _fetch_time(jax.jit(lambda ip, a, b: ip[0, 0]), imgp, cx, cy)
        per = max((t - t0) / 10.0, 1e-6)
        # aligned superslab DMA per point: the kernel's scratch is the
        # power-of-two (SH, SW) slab = (32, 256) f32 for size=24
        # (ops/slab_pallas.py) — 32 KiB per point
        traffic = N * 32 * 256 * 4
        rows.append({
            "metric": "Pallas slab extraction (1024 x 24x24, aligned DMA)",
            "value": round(per * 1e3, 3), "unit": "ms",
            "achieved_GBps": round(traffic / per / 1e9, 1),
            "hbm_roofline_pct": round(traffic / per / 1e9 / V5E_HBM_GBS * 100, 1),
        })
    return rows


def bench_scaling_rows():
    """Point-sharded BA on a virtual CPU mesh (1/2/4/8 devices), subprocess."""
    code = r"""
import json, time, os, sys
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from velocity_tpu.config import BAConfig
from velocity_tpu.parallel import make_mesh, ba_schur_sharded
from velocity_tpu.solvers.ba import BAProblem
from velocity_tpu.geometry.projection import Intrinsics

rng = np.random.default_rng(0)
nc, nt = 20, 1024
intr = Intrinsics(fx=jnp.float32(1993.9), fy=jnp.float32(1993.9),
                  cx=jnp.float32(960.5), cy=jnp.float32(540.5), skew=jnp.float32(0.0))
pts = np.concatenate([rng.uniform(-2, 2, (nt, 2)), rng.uniform(6, 10, (nt, 1))], 1)
pos = np.stack([np.linspace(0, 3.3, nc), np.zeros(nc), np.zeros(nc)], 1)
pix = np.stack([(pts + pos[c]) for c in range(nc)])
pix = np.stack([1993.9 * pix[..., 0] / pix[..., 2] + 960.5,
                1993.9 * pix[..., 1] / pix[..., 2] + 540.5], -1).astype(np.float32)
prob = BAProblem(intr=intr, pixels=jnp.asarray(pix),
                 mask=jnp.ones((nc, nt), bool), points0=jnp.asarray(pts, jnp.float32),
                 cams0=jnp.asarray(np.concatenate([pos, np.zeros((nc, 3))], 1), jnp.float32))
def timed(f):
    r = f(prob); np.asarray(r.points)
    best = 1e9
    for _ in range(3):
        t0 = time.time(); r = f(prob); np.asarray(r.points)
        best = min(best, time.time() - t0)
    return best

out = []
for nd in (1, 2, 4, 8):
    mesh = make_mesh({"point": nd}, devices=np.array(jax.devices()[:nd]))
    lo = timed(partial(ba_schur_sharded, mesh=mesh,
                       config=BAConfig(max_iters=2, tol=0.0)))
    hi = timed(partial(ba_schur_sharded, mesh=mesh,
                       config=BAConfig(max_iters=42, tol=0.0)))
    out.append({"devices": nd,
                "ms_per_iter": round(max(hi - lo, 1e-6) / 40 * 1e3, 3),
                "delta_s": round(hi - lo, 4)})
print(json.dumps(out))
""" % {"repo": os.path.dirname(os.path.abspath(__file__))}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env.pop("PYTHONPATH", None)
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=900, env=env)
        data = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:
        return [{"metric": "sharded BA scaling", "error": str(e)[:200]}]
    base = data[0]["ms_per_iter"]
    base_ok = data[0].get("delta_s", 0.0) >= 0.05
    return [{
        "metric": f"point-sharded Schur BA ms/iter, {d['devices']} virtual CPU devices"
                  " (nc=20, nt=1024; code-path validation, single real chip)",
        "value": d["ms_per_iter"], "unit": "ms/iter",
        "speedup_vs_1dev": (round(base / d["ms_per_iter"], 2)
                            if base_ok and d["ms_per_iter"] else None),
        "noise_dominated": bool(d.get("delta_s", 1.0) < 0.05),
        "note": "virtual devices on ONE host validate the sharded graph +"
                " collectives, not speedup (the FLOPs do not shrink and"
                " host-emulated collectives cost; see MULTICHIP dryrun)",
    } for d in data]


def main():
    _enable_compile_cache()
    rows = []
    prob, n_real = real_problem()
    rows += bench_ba_rows(prob, n_real)
    rows += bench_batched_schur_rows(prob, n_real)
    rows += bench_kernel_rows()
    rows += bench_scaling_rows()
    out = {"suite": "velocity_tpu extended benchmarks", "rows": rows}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_EXTENDED.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
