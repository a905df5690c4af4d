"""Bundle adjustment tests: synthetic recovery, Schur==dense equivalence, priors."""

import numpy as np
import jax.numpy as jnp
import pytest

from velocity_tpu.config import BAConfig
from velocity_tpu.geometry import Intrinsics, rpy_to_matrix
from velocity_tpu.solvers.ba import BAProblem, ba_dense, ba_constrained, ba_residual_rms
from velocity_tpu.solvers.schur import ba_schur

RNG = np.random.default_rng(5)
INTR = Intrinsics(
    fx=jnp.float64(1993.89), fy=jnp.float64(1993.89),
    cx=jnp.float64(960.5), cy=jnp.float64(540.5), skew=jnp.float64(0.0),
)


def _project_np(pc):
    u = 1993.89 * pc[..., 0] / pc[..., 2] + 960.5
    v = 1993.89 * pc[..., 1] / pc[..., 2] + 540.5
    return np.stack([u, v], axis=-1)


def make_scene(nc=6, nt=40, noise_px=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate(
        [rng.uniform(-2, 2, (nt, 2)), rng.uniform(6, 10, (nt, 1))], axis=1
    )
    pos = np.stack(
        [np.linspace(0, 1.8, nc), np.linspace(0, 0.15, nc), np.linspace(0, 0.35, nc)],
        axis=1,
    )
    rpy = np.zeros((nc, 3))
    rpy[1:] = rng.uniform(-0.02, 0.02, (nc - 1, 3))
    rpy[0] = 0
    cams = np.concatenate([pos, rpy], axis=1)
    cams[0] = 0
    pix = np.zeros((nc, nt, 2))
    for c in range(nc):
        C = np.asarray(rpy_to_matrix(jnp.asarray(rpy[c])))
        pix[c] = _project_np(pts @ C + pos[c])
    pix += rng.normal(0, noise_px, pix.shape)
    mask = np.ones((nc, nt), bool)
    return pts, cams, pix, mask


def perturbed_problem(noise_px=0.0, seed=0, nc=6, nt=40):
    pts, cams, pix, mask = make_scene(nc, nt, noise_px, seed)
    rng = np.random.default_rng(seed + 1)
    pts0 = pts + rng.normal(0, 0.05, pts.shape)
    cams0 = cams.copy()
    cams0[1:, 0:3] += rng.normal(0, 0.03, (nc - 1, 3))
    cams0[1:, 3:6] += rng.normal(0, 0.005, (nc - 1, 3))
    prob = BAProblem(
        intr=INTR,
        pixels=jnp.asarray(pix),
        mask=jnp.asarray(mask),
        points0=jnp.asarray(pts0),
        cams0=jnp.asarray(cams0),
    )
    return prob, pts, cams


def _align_scale(res, cams):
    """Monocular BA has a free global-scale gauge (camera 0 pinned only);
    align the recovered scale to truth via camera 1's baseline."""
    s = np.linalg.norm(np.asarray(res.cams)[1, 0:3]) / np.linalg.norm(cams[1, 0:3])
    return np.asarray(res.points) / s, np.asarray(res.cams)[:, 0:3] / s


class TestDenseBA:
    def test_noiseless_recovery(self):
        prob, pts, cams = perturbed_problem()
        res = ba_dense(prob, BAConfig(max_iters=40, tol=1e-12))
        assert float(res.residual_rms) < 1e-8, float(res.residual_rms)
        pts_al, pos_al = _align_scale(res, cams)
        np.testing.assert_allclose(pts_al, pts, atol=1e-6)
        np.testing.assert_allclose(pos_al, cams[:, 0:3], atol=1e-6)

    def test_camera0_pinned(self):
        prob, _, _ = perturbed_problem()
        res = ba_dense(prob, BAConfig(max_iters=5))
        np.testing.assert_array_equal(np.asarray(res.cams)[0], 0.0)

    def test_noisy_improves(self):
        prob, _, _ = perturbed_problem(noise_px=0.5)
        before = float(ba_residual_rms(prob, prob.points0, prob.cams0))
        res = ba_dense(prob, BAConfig(max_iters=20))
        assert float(res.residual_rms) < before
        assert float(res.residual_rms) < 0.6  # ~ noise floor


class TestSchurBA:
    def test_equals_dense(self):
        """Schur reduction must reproduce the dense normal-equation iterates."""
        prob, _, _ = perturbed_problem(noise_px=0.3)
        cfgd = BAConfig(max_iters=8)
        d = ba_dense(prob, cfgd)
        s = ba_schur(prob, cfgd)
        assert int(d.iterations) == int(s.iterations)
        np.testing.assert_allclose(np.asarray(s.points), np.asarray(d.points), atol=1e-8)
        np.testing.assert_allclose(np.asarray(s.cams), np.asarray(d.cams), atol=1e-8)

    def test_noiseless_recovery(self):
        prob, pts, cams = perturbed_problem()
        res = ba_schur(prob, BAConfig(max_iters=40, tol=1e-12))
        assert float(res.residual_rms) < 1e-8
        pts_al, _ = _align_scale(res, cams)
        np.testing.assert_allclose(pts_al, pts, atol=1e-6)

    def test_masked_observations_inert(self):
        prob, _, _ = perturbed_problem(noise_px=0.2)
        # corrupt 30% of observations but mask them out
        mask = np.asarray(prob.mask).copy()
        pix = np.asarray(prob.pixels).copy()
        rng = np.random.default_rng(9)
        bad = rng.uniform(size=mask.shape) < 0.3
        bad[:, :4] = False  # keep a core of clean tracks
        pix[bad] += 1000.0
        mask[bad] = False
        prob2 = prob._replace(pixels=jnp.asarray(pix), mask=jnp.asarray(mask))
        res = ba_schur(prob2, BAConfig(max_iters=15))
        assert float(res.residual_rms) < 0.5

    def test_larger_problem(self):
        prob, pts, _ = perturbed_problem(nc=10, nt=256)
        res = ba_schur(prob, BAConfig(max_iters=25))
        assert float(res.residual_rms) < 1e-5


class TestConstrainedBA:
    def test_straight_line_recovery(self):
        """Cameras on a line, shared orientation — the fcnNLS_batch2 model."""
        nc, nt = 6, 50
        rng = np.random.default_rng(2)
        pts = np.concatenate(
            [rng.uniform(-2, 2, (nt, 2)), rng.uniform(6, 10, (nt, 1))], axis=1
        )
        direction = np.array([0.9, 0.1, 0.42])
        direction /= np.linalg.norm(direction)
        ranges = np.linspace(0, 2.0, nc)
        pos = ranges[:, None] * direction
        pix = np.zeros((nc, nt, 2))
        for c in range(nc):
            pix[c] = _project_np(pts + pos[c])
        prob = BAProblem(
            intr=INTR,
            pixels=jnp.asarray(pix),
            mask=jnp.asarray(np.ones((nc, nt), bool)),
            points0=jnp.asarray(pts + rng.normal(0, 0.03, pts.shape)),
            cams0=jnp.asarray(
                np.concatenate([pos + rng.normal(0, 0.02, pos.shape),
                                np.zeros((nc, 3))], axis=1)
            ),
        )
        res = ba_constrained(prob, BAConfig(max_iters=15))
        assert float(res.residual_rms) < 1e-4, float(res.residual_rms)
        got_pos = np.asarray(res.cams)[:, 0:3]
        np.testing.assert_allclose(got_pos, pos, atol=1e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestCGCameraSolver:
    def test_cg_matches_dense(self):
        from velocity_tpu.config import BAConfig

        prob, _, _ = perturbed_problem(noise_px=0.3, nc=8, nt=48)
        dense = ba_schur(prob, BAConfig(max_iters=6))
        cgres = ba_schur(prob, BAConfig(max_iters=6, camera_solver="cg",
                                        cg_tol=1e-12, cg_max_iters=200))
        np.testing.assert_allclose(
            np.asarray(cgres.cams), np.asarray(dense.cams), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cgres.points), np.asarray(dense.points), atol=1e-6)
