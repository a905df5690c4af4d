"""Benchmark: end-to-end frames/s/chip on IMG_4119.MOV (decode included).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference CPU implementation measured at 14.67 fps on IMG_4119
(BASELINE.md). Also validates the speed estimate is within the ATE bound and
reports it in the auxiliary fields.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_FPS_4119 = 14.67
GOLDEN_SPEED_4119 = 18.74


def main():
    from velocity_tpu.config import PipelineConfig, SolverConfig
    from velocity_tpu.pipeline import SpeedEstimator
    from velocity_tpu.pipeline.datasets import known_run

    run = known_run("IMG_4119")
    cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
    est = SpeedEstimator(cfg)

    # warmup: compile all jitted stages + cache annotation/init (3 frames)
    est.run(run.video, annotation=run.annotation, start_frame=run.start_frame,
            n_frames=7, verbose=False, collect_images=False)

    t0 = time.time()
    res = est.run(run.video, annotation=run.annotation,
                  start_frame=run.start_frame, n_frames=run.n_frames,
                  verbose=False, collect_images=False)
    wall = time.time() - t0
    fps = run.n_frames / wall

    out = {
        "metric": "frames/s/chip IMG_4119 end-to-end (incl. decode)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS_4119, 3),
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
