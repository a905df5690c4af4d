"""Sharded BA and windowed-pipeline tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from velocity_tpu.config import BAConfig
from velocity_tpu.parallel import make_mesh, ba_schur_sharded, windowed_ba, stitch_windows, split_windows
from velocity_tpu.solvers.ba import BAProblem
from velocity_tpu.solvers.schur import ba_schur

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from test_ba import perturbed_problem, INTR, _project_np  # noqa: E402


def _pad_problem(prob, nt_pad):
    """Pad track capacity with masked lanes to make it mesh-divisible."""
    nt = prob.points0.shape[0]
    nc = prob.pixels.shape[0]
    extra = nt_pad - nt
    pix = jnp.concatenate(
        [prob.pixels, jnp.zeros((nc, extra, 2), prob.pixels.dtype)], axis=1
    )
    mask = jnp.concatenate([prob.mask, jnp.zeros((nc, extra), bool)], axis=1)
    # benign dummy geometry for masked lanes (in front of all cameras)
    dummy = jnp.tile(jnp.asarray([[0.0, 0.0, 8.0]], prob.points0.dtype), (extra, 1))
    pts = jnp.concatenate([prob.points0, dummy], axis=0)
    return prob._replace(pixels=pix, mask=mask, points0=pts)


class TestShardedBA:
    def test_matches_single_device(self):
        assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
        prob, _, _ = perturbed_problem(noise_px=0.3, nc=6, nt=40)
        prob = _pad_problem(prob, 48)  # divisible by 8
        mesh = make_mesh({"point": 8})
        cfg = BAConfig(max_iters=8)
        single = ba_schur(prob, cfg)
        shard = ba_schur_sharded(prob, mesh, "point", cfg)
        assert int(single.iterations) == int(shard.iterations)
        np.testing.assert_allclose(
            np.asarray(shard.points), np.asarray(single.points), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(shard.cams), np.asarray(single.cams), atol=1e-8
        )

    def test_masked_padding_inert(self):
        prob, _, _ = perturbed_problem(noise_px=0.2, nc=6, nt=40)
        base = ba_schur(prob, BAConfig(max_iters=8))
        padded = _pad_problem(prob, 64)
        mesh = make_mesh({"point": 8})
        shard = ba_schur_sharded(padded, mesh, "point", BAConfig(max_iters=8))
        np.testing.assert_allclose(
            np.asarray(shard.points)[:40], np.asarray(base.points), atol=1e-8
        )


class TestWindowedBA:
    def test_windows_and_stitching(self):
        """2 windows x (2x point) mesh: per-window BA then chain stitching."""
        nw, nc, nt = 2, 5, 32
        rng = np.random.default_rng(4)
        mesh = make_mesh({"window": 2, "point": 4})

        pix = np.zeros((nw, nc, nt, 2))
        pts_all, cams_all = [], []
        # window w starts where window w-1 ended (overlap 1 camera)
        base = np.zeros(3)
        step = np.array([0.35, 0.01, 0.06])
        for w in range(nw):
            pts = np.concatenate(
                [rng.uniform(-2, 2, (nt, 2)), rng.uniform(6, 10, (nt, 1))], axis=1
            ) - base  # express in this window's first-camera frame
            pos = np.arange(nc)[:, None] * step
            cams = np.concatenate([pos, np.zeros((nc, 3))], axis=1)
            for c in range(nc):
                pix[w, c] = _project_np(pts + pos[c])
            pts_all.append(pts + rng.normal(0, 0.02, pts.shape))
            cams0 = cams.copy()
            cams0[1:, 0:3] += rng.normal(0, 0.01, (nc - 1, 3))
            cams_all.append(cams0)
            base = base + step * (nc - 1)

        points, cams, iters = windowed_ba(
            jnp.asarray(pix),
            jnp.asarray(np.ones((nw, nc, nt), bool)),
            jnp.asarray(np.stack(pts_all)),
            jnp.asarray(np.stack(cams_all)),
            INTR,
            mesh,
            config=BAConfig(max_iters=30, tol=1e-12),
        )
        cams = np.asarray(cams)
        # each window recovers its local trajectory (up to per-window scale;
        # noiseless observations make scale drift negligible here)
        for w in range(nw):
            np.testing.assert_allclose(
                cams[w, :, 0:3], np.arange(nc)[:, None] * step, atol=4e-3
            )
        # stitch: global trajectory matches the generated chain
        glob = stitch_windows(cams[:, :, 0:3], overlap=1)
        want = np.arange(nw * nc - 1)[:, None] * step
        np.testing.assert_allclose(glob, want, atol=8e-3)

    def test_split_windows(self):
        assert split_windows(10, 4, 1) == [(0, 4), (3, 7), (6, 10)]
        assert split_windows(7, 4, 1) == [(0, 4), (3, 7)]
        assert split_windows(4, 4, 1) == [(0, 4)]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestShardedTracking:
    def test_lk_feature_shard_matches_single(self):
        import numpy as np
        from scipy.ndimage import gaussian_filter, shift as ndshift
        from velocity_tpu.parallel import make_mesh
        from velocity_tpu.parallel.track_shard import lk_forward_backward_sharded
        from velocity_tpu.ops.lk_lanes import lk_forward_backward_lanes

        rng = np.random.default_rng(3)
        base = gaussian_filter(rng.random((300, 420)).astype(np.float32) * 255, 2)
        im0 = jnp.asarray(base)
        im1 = jnp.asarray(ndshift(base, (1.3, -2.1), order=3).astype(np.float32))
        pts = jnp.asarray(np.stack([
            rng.uniform(40, 380, 64), rng.uniform(40, 260, 64)], 1
        ).astype(np.float32))
        kw = dict(fb_threshold=1.0, win=15, max_level=2, iters=10, eps=0.01)
        single = lk_forward_backward_lanes(im0, im1, pts, **kw)
        mesh = make_mesh({"feature": 8})
        shard = lk_forward_backward_sharded(im0, im1, pts, mesh, "feature", **kw)
        np.testing.assert_allclose(np.asarray(shard.points),
                                   np.asarray(single.points), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(shard.status),
                                      np.asarray(single.status))


class TestShardedTrackerProduct:
    """TrackerConfig.shard_features routes the PRODUCT tracker through the
    feature-sharded LK (SURVEY §2.4 TP analog) — not just the library fn."""

    def test_fused_step_matches_single_device(self):
        import numpy as np
        from scipy.ndimage import gaussian_filter, shift as ndshift
        import dataclasses
        from velocity_tpu.config import TrackerConfig, LKConfig, SolverConfig
        from velocity_tpu.pipeline.tracker import fused_frame_step_pyr, frame_pyramids_jit

        rng = np.random.default_rng(5)
        base = gaussian_filter(rng.random((240, 320)).astype(np.float32) * 255, 2)
        im0 = jnp.asarray(base)
        im1 = jnp.asarray(ndshift(base, (0.9, -1.4), order=3).astype(np.float32))
        N = 128
        pts = np.zeros((N, 2), np.float32)
        pts[:, 0] = rng.uniform(60, 260, N)
        pts[:, 1] = rng.uniform(60, 180, N)
        vg = np.ones(N, bool)
        vp = vg.copy()
        p3 = np.concatenate(
            [rng.uniform(-1, 1, (N, 2)), rng.uniform(6, 9, (N, 1))], 1
        ).astype(np.float32)
        from velocity_tpu.geometry.projection import Intrinsics
        intr = Intrinsics(*(jnp.float32(v) for v in (500.0, 500.0, 160.0, 120.0, 0.0)))
        key = jax.random.PRNGKey(0)

        def run(cfg):
            pyr0, spyr0 = frame_pyramids_jit(im0, cfg)
            out = fused_frame_step_pyr(
                pyr0, spyr0, im1, jnp.asarray(pts), jnp.asarray(vg),
                jnp.asarray(vp), jnp.asarray(p3), intr, key, cfg,
                SolverConfig(dtype="float32"), jnp.float32, None)
            return np.asarray(out[2]), np.asarray(out[3]), np.asarray(out[5])

        base_cfg = TrackerConfig(
            max_features=N,
            lk_coarse=LKConfig(15, 2, 10, 0.1),
            lk_fine=LKConfig(31, 0, 15, 0.01),
        )
        p_single, v_single, t_single = run(base_cfg)
        p_shard, v_shard, t_shard = run(
            dataclasses.replace(base_cfg, shard_features=8))
        np.testing.assert_allclose(p_shard, p_single, atol=1e-4)
        np.testing.assert_array_equal(v_shard, v_single)
        np.testing.assert_allclose(t_shard, t_single, atol=1e-4)
