"""Golden-trajectory end-to-end tests (BASELINE.md ATE anchors). Marked slow."""

from pathlib import Path

import numpy as np
import pytest

from velocity_tpu.pipeline import SpeedEstimator
from velocity_tpu.pipeline.datasets import known_run

HAVE_DATA = Path("/root/reference/data/IMG_4134.MOV").exists()
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAVE_DATA, reason="reference dataset not mounted"),
]

# golden per-frame dx (m) from BASELINE.md, IMG_4134 frames 1..19
GOLDEN_4134_DX = np.array([
    0.36, 0.37, 0.37, 0.38, 0.38, 0.38, 0.38, 0.37, 0.37, 0.37,
    0.37, 0.37, 0.37, 0.37, 0.37, 0.36, 0.36, 0.37, 0.36,
])


@pytest.fixture(scope="module")
def run_4134():
    cfg = known_run("IMG_4134")
    est = SpeedEstimator()
    return est.run(cfg.video, annotation=cfg.annotation,
                   start_frame=cfg.start_frame, n_frames=cfg.n_frames,
                   verbose=False), cfg


class TestGolden4134:
    def test_mean_speed_within_ate(self, run_4134):
        res, cfg = run_4134
        assert abs(res.speed_kmh - cfg.golden_speed_kmh) < 0.8, res.speed_kmh
        assert res.speed_std < 1.6

    def test_per_frame_dx_close(self, run_4134):
        res, _ = run_4134
        dx = res.S[1:, 6]
        np.testing.assert_allclose(dx, GOLDEN_4134_DX, atol=0.03)

    def test_total_distance(self, run_4134):
        res, _ = run_4134
        assert abs(res.S[-1, 7] - 7.02) < 0.15

    def test_track_survivorship(self, run_4134):
        res, _ = run_4134
        # golden: 177 -> 151; allow small detector/gating differences
        assert abs(res.S[0, 2] - 177) <= 10
        assert abs(res.S[-1, 2] - 151) <= 10

    def test_residuals_reasonable(self, run_4134):
        res, cfg = run_4134
        assert res.residual_px < cfg.golden_residual_px * 1.5


class TestGolden4119:
    def test_mean_speed_within_ate(self):
        cfg = known_run("IMG_4119")
        est = SpeedEstimator()
        res = est.run(cfg.video, annotation=cfg.annotation,
                      start_frame=cfg.start_frame, n_frames=cfg.n_frames,
                      verbose=False)
        assert abs(res.speed_kmh - cfg.golden_speed_kmh) < 0.5, res.speed_kmh
        assert abs(res.residual_px - cfg.golden_residual_px) < 0.3


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
