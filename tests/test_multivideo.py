"""Batched multi-video pipeline test (slow; CPU mesh)."""

from pathlib import Path

import pytest

from velocity_tpu.pipeline.multivideo import run_batch

HAVE_DATA = Path("/root/reference/data/IMG_4134.MOV").exists()
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAVE_DATA, reason="dataset not mounted"),
]


def test_three_videos_batched():
    res = run_batch(
        [
            "/root/reference/data/IMG_4134.MOV",
            "/root/reference/data/IMG_4119.MOV",
            "/root/reference/data/IMG_4238.MOV",
        ],
        annotations=[None, None, "/root/repo/data/IMG_4238.MOV.npz"],
        start_frames=[19, 41, 8],
        n_frames=20,
        verbose=False,
    )
    assert len(res) == 3
    speeds = [r.speed_kmh for r in res]
    assert abs(speeds[0] - 39.89) < 1.5, speeds  # golden 4134
    assert abs(speeds[1] - 18.74) < 1.5, speeds  # golden 4119
    # GT ~60 km/h (vidExample.py:21 comment — speedometer-read, approximate).
    # At 0.55 m/frame and ~3 m range the rolling-shutter-distorted plate quad
    # (4-corner planar residual 2.26 px vs 0.25-0.97 px on the 20/40 km/h
    # clips) makes the METRIC ANCHOR itself uncertain: independent estimators
    # on the same tracks span 51-72 km/h (per-frame chain 51.4 +/- 3.0 km/h,
    # windowed BA 68-72 km/h; see README). Assert the estimate is stable and
    # inside the anchor-uncertainty band rather than pretending a tight GT.
    assert 45.0 < speeds[2] < 75.0, speeds
    assert res[2].speed_std < 6.0, res[2].speed_std
    assert res[2].residual_px < 3.5, res[2].residual_px
    for r in res:
        assert r.S.shape == (20, 9)
        assert r.valid[1:].sum() > 0
