"""Benchmark: end-to-end frames/s/chip on IMG_4119.MOV (decode included).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference CPU implementation measured at 14.67 fps on IMG_4119
(BASELINE.md). Also validates the speed estimate against the golden value and
reports it in auxiliary fields.

Strategy: the scan pipeline in transfer-lean mode (2 device dispatches/video,
packed per-frame summaries; the tunnel D2H link runs ~3 MB/s so fetching
per-point history would dominate). Falls back to the per-frame driver if the
device rejects the scanned graph. Warmup uses the SAME frame count as the
timed runs so no recompile lands in the timing loop; a persistent XLA
compilation cache in-repo makes later processes skip the multi-minute
Mosaic/XLA compile entirely.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

BASELINE_FPS_4119 = 14.67
GOLDEN_SPEED_4119 = 18.74
N_FRAMES = 20


def _enable_compile_cache():
    import os
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax: cache flags absent; compile cost stays in warmup


def _run_scan(cfg, run, n):
    from velocity_tpu.pipeline.scan import ScanSpeedRunner

    r = ScanSpeedRunner(cfg)
    return r.run(run.video, annotation=run.annotation,
                 start_frame=run.start_frame, n_frames=n, verbose=False,
                 lean=True)


def _run_frames(cfg, run, n):
    from velocity_tpu.pipeline import SpeedEstimator

    est = SpeedEstimator(cfg)
    return est.run(run.video, annotation=run.annotation,
                   start_frame=run.start_frame, n_frames=n,
                   verbose=False, collect_images=False, lean=True)


def main():
    _enable_compile_cache()
    from velocity_tpu.config import PipelineConfig, SolverConfig
    from velocity_tpu.pipeline.datasets import known_run

    run = known_run("IMG_4119")
    cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))

    runner = _run_scan
    mode = "scan"
    try:
        runner(cfg, run, N_FRAMES)  # warmup/compile at the TIMED shape
    except Exception as e:  # scanned graph rejected -> per-frame fallback
        sys.stderr.write(f"scan path failed ({type(e).__name__}: {e}); "
                         "falling back to per-frame driver\n")
        runner = _run_frames
        mode = "frames"
        runner(cfg, run, N_FRAMES)  # warm the per-frame compiles

    walls, res = [], None
    for _ in range(5):
        t0 = time.time()
        res = runner(cfg, run, N_FRAMES)
        walls.append(time.time() - t0)
    # median of 5: the tunneled TPU's upload bandwidth drifts by session and
    # individual trials jitter ~20%; the median is the honest steady state
    fps = N_FRAMES / statistics.median(walls)

    out = {
        "metric": "frames/s/chip IMG_4119 end-to-end (incl. decode)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS_4119, 3),
        "mode": mode,
        "speed_kmh": round(res.speed_kmh, 2),
        "speed_std": round(res.speed_std, 2),
        "golden_speed_kmh": GOLDEN_SPEED_4119,
        "speed_err_kmh": round(abs(res.speed_kmh - GOLDEN_SPEED_4119), 2),
        "residual_px": round(res.residual_px, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
