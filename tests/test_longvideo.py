"""Long-video windowed driver: stitching units + end-to-end resume (slow)."""

from pathlib import Path

import numpy as np
import pytest

from velocity_tpu.parallel.windows import stitch_windows, split_windows

HAVE_DATA = Path("/root/reference/data/IMG_4119.MOV").exists()


class TestStitchGauge:
    def test_translation_chain(self):
        # two windows of a straight track, window-local frames
        g = np.stack([np.linspace(0, 10, 11), np.zeros(11), np.zeros(11)], 1)
        w0 = g[:6] - g[0]
        w1 = g[5:11] - g[5]
        out = stitch_windows(np.stack([w0, w1]), overlap=1, gauge="translation")
        np.testing.assert_allclose(out, g - g[0], atol=1e-12)

    def test_similarity_recovers_rotation_and_scale(self):
        rng = np.random.default_rng(0)
        g = np.cumsum(rng.uniform(0.5, 1.0, (13, 3)), axis=0)
        # two 8-frame windows sharing exactly 3 frames (rows 5, 6, 7)
        w0 = g[0:8] - g[0]
        th = 0.3
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        s = 1.7
        w1_global = g[5:13] - g[5]
        w1 = (R.T @ (w1_global.T / s)).T  # local = s^-1 R^-1 global
        out = stitch_windows(np.stack([w0, w1]), overlap=3,
                             gauge="similarity")
        # first window rows pass through untouched, and the MAPPED second
        # window matches the global chain: the stitcher must undo the
        # rotation+scale gauge on the non-shared rows too
        np.testing.assert_allclose(out, g - g[0], atol=1e-9)

    def test_align_overlap_recovers_similarity(self):
        rng = np.random.default_rng(1)
        from velocity_tpu.parallel.windows import align_overlap

        g = np.cumsum(rng.uniform(0.3, 1.0, (6, 3)), axis=0)
        th = -0.2
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]])
        s = 0.8
        local = (R.T @ (g.T / s)).T
        Rf, sf, tf = align_overlap(local[:4], g[:4])
        mapped = sf * (Rf @ local.T).T + tf
        np.testing.assert_allclose(mapped, g, atol=1e-9)
        # degenerate (collinear) overlap falls back to translation
        line = np.stack([np.arange(4.0), np.zeros(4), np.zeros(4)], 1)
        Rf2, sf2, _ = align_overlap(line, line + [0, 1, 0])
        np.testing.assert_allclose(Rf2, np.eye(3), atol=1e-12)
        assert sf2 == 1.0

    def test_split_windows_cover(self):
        w = split_windows(201, 24, 3)
        assert w[0][0] == 0 and w[-1][1] == 201
        for (s0, e0), (s1, e1) in zip(w, w[1:]):
            assert s1 == e0 - 3


@pytest.mark.slow
@pytest.mark.skipif(not HAVE_DATA, reason="reference dataset not mounted")
class TestLongVideoResume:
    def test_resume_matches_uninterrupted(self, tmp_path):
        from velocity_tpu.config import PipelineConfig, SolverConfig
        from velocity_tpu.pipeline.longvideo import LongVideoRunner
        from velocity_tpu.pipeline.datasets import known_run

        run = known_run("IMG_4119")
        cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
        n = 14
        ck = tmp_path / "state.npz"

        full = LongVideoRunner(cfg).run(
            run.video, annotation=run.annotation, start_frame=run.start_frame,
            n_frames=n, window=6, overlap=2, ba_refine=False, verbose=False,
        )
        # interrupted: first pass writes checkpoints, second pass resumes
        LongVideoRunner(cfg).run(
            run.video, annotation=run.annotation, start_frame=run.start_frame,
            n_frames=10, window=6, overlap=2, checkpoint=ck, ba_refine=False,
            verbose=False,
        )
        assert ck.exists()
        resumed = LongVideoRunner(cfg).run(
            run.video, annotation=run.annotation, start_frame=run.start_frame,
            n_frames=n, window=6, overlap=2, checkpoint=ck, resume=True,
            ba_refine=False, verbose=False,
        )
        # trajectories agree (resume re-enters at a window boundary with the
        # saved state; the boundary warm-start round-trips f32->f64->f32, so
        # individual frames may differ at the centimeter level)
        np.testing.assert_allclose(
            resumed.B[:, 0:3], full.B[:, 0:3], atol=2.5e-2)
        assert abs(resumed.speed_kmh - full.speed_kmh) < 0.3


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


@pytest.mark.slow
@pytest.mark.skipif(not HAVE_DATA, reason="reference dataset not mounted")
class TestLongVideoFullLength:
    def test_full_4119(self):
        """Every frame from the annotated start to the end of the video
        (reference anchor: vidExample.py:22-23 reads only 20)."""
        from velocity_tpu.config import PipelineConfig, SolverConfig
        from velocity_tpu.pipeline.longvideo import LongVideoRunner
        from velocity_tpu.pipeline.datasets import known_run

        run = known_run("IMG_4119")
        cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
        res = LongVideoRunner(cfg).run(
            run.video, annotation=run.annotation, start_frame=run.start_frame,
            n_frames=None, window=24, overlap=3, ba_refine=True,
            verbose=False)
        n = res.S.shape[0]
        assert n == 160, n  # 201-frame video, annotated start at 41
        # full-length mean within the long-range noise band around GT 20
        # (measured 20.9 +/- 3.8 on TPU; see LONGVIDEO.md)
        assert 17.0 < res.speed_kmh < 24.0, res.speed_kmh
        # the golden 20-frame prefix stays golden in the full-length run
        assert abs(float(res.S[1:20, 8].mean()) - 18.74) < 1.0
        assert np.isfinite(res.S[1:, 8]).all()


@pytest.mark.slow
@pytest.mark.skipif(not HAVE_DATA, reason="reference dataset not mounted")
class TestWindowFaultRecovery:
    def test_transient_segment_failure_recovers_identically(self, monkeypatch):
        """A transient device failure during one window must cost nothing:
        the driver rebuilds device state from the host-side boundary mirrors
        and retries (SURVEY §5: window-level retry is the fault unit)."""
        from velocity_tpu.config import PipelineConfig, SolverConfig
        from velocity_tpu.pipeline import longvideo as lv
        from velocity_tpu.pipeline.datasets import known_run

        run = known_run("IMG_4119")
        cfg = PipelineConfig(solver=SolverConfig(dtype="float32"))
        kw = dict(annotation=run.annotation, start_frame=run.start_frame,
                  n_frames=14, window=6, overlap=2, ba_refine=False,
                  verbose=False)
        clean = lv.LongVideoRunner(cfg).run(run.video, **kw)

        real = lv.scan_segment
        calls = {"n": 0}

        def flaky(*args, **kwargs):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected transient device failure")
            return real(*args, **kwargs)

        monkeypatch.setattr(lv, "scan_segment", flaky)
        recovered = lv.LongVideoRunner(cfg).run(run.video, **kw)
        assert calls["n"] >= 3  # the failed window was retried
        np.testing.assert_allclose(
            recovered.B[:, 0:3], clean.B[:, 0:3], atol=2.5e-2)
        assert abs(recovered.speed_kmh - clean.speed_kmh) < 0.3
