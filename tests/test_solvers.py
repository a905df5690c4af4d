"""Pose solver and triangulation tests: synthetic SfM recovery + reference-twin parity.

The numpy "twin" implementations reproduce the reference's LM algorithm
(forward differences dx=1e-6, identity damping, ramped steps — SURVEY.md §3.3)
independently, to confirm our analytic-Jacobian solvers land on the same optima.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from velocity_tpu.config import SolverConfig
from velocity_tpu.geometry import (
    Intrinsics,
    rpy_to_matrix,
    license_plate_points,
    project_camera_points,
    pixel_to_unit_ray,
)
from velocity_tpu.solvers import (
    lm_solve,
    solve_translation,
    solve_pose_rt,
    estimate_world_camera_pose,
    pairwise_intercept,
    nray_intercept,
    msv_refine_translation,
)

RNG = np.random.default_rng(7)
INTR = Intrinsics(
    fx=jnp.float64(1993.89), fy=jnp.float64(1993.89),
    cx=jnp.float64(960.5), cy=jnp.float64(540.5), skew=jnp.float64(0.0),
)


def _project_np(intr, pc):
    u = (float(intr.fx) * pc[:, 0] + float(intr.skew) * pc[:, 1]) / pc[:, 2] + float(intr.cx)
    v = float(intr.fy) * pc[:, 1] / pc[:, 2] + float(intr.cy)
    return np.stack([u, v], axis=1)


def _twin_nls_t(intr, p, pw, x0):
    """Numpy twin of the reference 3-param LM (fwd-diff, ramped, damped)."""
    x = x0.astype(np.float64).copy()
    z = p.astype(np.float64).ravel()
    dx = 1e-6
    for i in range(30):
        b0 = pw + x
        zhat = _project_np(intr, b0).ravel()
        JT = np.zeros((3, z.size))
        for j in range(3):
            d = np.zeros(3); d[j] = dx
            JT[j] = (_project_np(intr, b0 + d).ravel() - zhat) / dx
        delta = np.linalg.solve(JT @ JT.T + np.eye(3), JT @ (z - zhat))
        delta *= min(((i + 1) * 0.2) ** 2, 1.0)
        x = x + delta
        if np.sqrt((delta**2).mean()) < 1e-8:
            break
    return x


class TestLMEngine:
    def test_linear_problem_one_gn_step(self):
        """On a linear LSQ problem GN converges immediately (modulo ramp/damping)."""
        A = jnp.asarray(RNG.normal(size=(20, 3)))
        b = jnp.asarray(RNG.normal(size=20))
        x_star = jnp.linalg.lstsq(A, b)[0]

        res = lm_solve(lambda x: b - A @ x, jnp.zeros(3), max_iters=50, tol=1e-12,
                       damping=1e-12, use_ramp=False)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star), atol=1e-9)

    def test_ramp_limits_early_steps(self):
        """With the reference ramp, the first step is scaled by 0.04."""
        A = jnp.eye(2)
        b = jnp.ones(2)
        res = lm_solve(lambda x: b - A @ x, jnp.zeros(2), max_iters=1, damping=0.0,
                       use_ramp=True, tol=0.0)
        np.testing.assert_allclose(np.asarray(res.x), 0.04 * np.ones(2), atol=1e-12)


class TestPlatePoseCandidates:
    """Planar-pose ambiguity machinery (solvers/pose.py round 5)."""

    INTR_VALS = (1993.9, 1993.9, 960.5, 540.5, 0.0)

    def _intr(self):
        from velocity_tpu.geometry.projection import Intrinsics

        return Intrinsics(*(jnp.float64(v) for v in self.INTR_VALS))

    def _plate(self):
        from velocity_tpu.geometry.plate import license_plate_points

        return np.asarray(license_plate_points("Chile"), np.float64)

    def test_homography_pose_exact_on_clean_quad(self):
        from velocity_tpu.solvers.pose import _planar_pose_homography_np
        from velocity_tpu.geometry.rotations import rpy_to_matrix
        from velocity_tpu.geometry.projection import world_to_image

        intr, plate = self._intr(), self._plate()
        R = np.asarray(rpy_to_matrix(jnp.asarray([0.3, -0.2, 0.1], jnp.float64)))
        t = np.array([-1.0, -0.4, 4.0])
        q = np.asarray(world_to_image(intr, jnp.asarray(R), jnp.asarray(t),
                                      jnp.asarray(plate)))
        Rh, th = _planar_pose_homography_np(intr, q, plate)
        np.testing.assert_allclose(Rh, R, atol=1e-10)
        np.testing.assert_allclose(th, t, atol=1e-10)

    def test_candidates_contain_truth_and_its_mirror(self):
        from velocity_tpu.solvers.pose import plate_pose_candidates
        from velocity_tpu.geometry.rotations import rpy_to_matrix
        from velocity_tpu.geometry.projection import world_to_image
        from velocity_tpu.config import SolverConfig

        intr, plate = self._intr(), self._plate()
        R = np.asarray(rpy_to_matrix(jnp.asarray([0.25, -0.3, 0.05],
                                                 jnp.float64)))
        t = np.array([-0.8, -0.3, 5.0])
        q = np.asarray(world_to_image(intr, jnp.asarray(R), jnp.asarray(t),
                                      jnp.asarray(plate)))
        # ~1 px corner noise: enough to open the two-fold ambiguity
        q = q + np.array([[0.9, -0.7], [-0.8, 0.6], [0.7, 0.9], [-0.6, -0.8]])
        cands = plate_pose_candidates(intr, jnp.asarray(q), jnp.asarray(plate),
                                      SolverConfig())
        assert len(cands) >= 1
        # the branch nearest the true pose exists and is metrically close
        errs = [np.linalg.norm(np.asarray(c.t) - t) for c in cands]
        assert min(errs) < 0.25, errs
        # deterministic: a second call returns identical candidates
        cands2 = plate_pose_candidates(intr, jnp.asarray(q),
                                       jnp.asarray(plate), SolverConfig())
        assert len(cands) == len(cands2)
        for a, b in zip(cands, cands2):
            np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))

    def test_resolve_plate_pose_picks_track_consistent_branch(self):
        from velocity_tpu.pipeline.anchor import resolve_plate_pose
        from velocity_tpu.geometry.rotations import rpy_to_matrix
        from velocity_tpu.geometry.projection import world_to_image
        from velocity_tpu.config import PipelineConfig

        intr, plate = self._intr(), self._plate()
        R = np.asarray(rpy_to_matrix(jnp.asarray([0.25, -0.3, 0.05],
                                                 jnp.float64)))
        t0 = np.array([-0.8, -0.3, 5.0])
        # synthetic 6-frame plate track: the car recedes 0.4 m/frame
        k = 6
        track = np.full((k, 16, 2), np.nan)
        for f in range(k):
            tf = t0 + np.array([0.0, 0.0, 0.4]) * f
            track[f, 0:4] = np.asarray(world_to_image(
                intr, jnp.asarray(R), jnp.asarray(tf), jnp.asarray(plate)))
        q = track[0, 0:4] + np.array([[0.9, -0.7], [-0.8, 0.6],
                                      [0.7, 0.9], [-0.6, -0.8]])
        track[0, 0:4] = q  # frame-0 lanes are the (noisy) annotation
        pose0, p3c, t_rel, res_track = resolve_plate_pose(
            intr, q, track, PipelineConfig())
        dx = np.linalg.norm(np.diff(t_rel, axis=0), axis=1)
        # winner reproduces the 0.4 m/frame motion (wrong branch would not)
        np.testing.assert_allclose(dx, 0.4, atol=0.05)


class TestPoseSolvers:
    def _scene(self, n=60, z0=8.0):
        pw = np.concatenate(
            [RNG.uniform(-2, 2, (n, 2)), RNG.uniform(-0.5, 0.5, (n, 1))], axis=1
        )
        t_true = np.array([0.4, -0.3, z0])
        return pw, t_true

    def test_translation_recovery_exact(self):
        pw, t_true = self._scene()
        p = _project_np(INTR, pw + t_true)
        res = solve_translation(INTR, jnp.asarray(p), jnp.asarray(pw),
                                jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(res.x), t_true, atol=1e-7)
        assert float(res.residual_rms) < 1e-6

    def test_translation_matches_reference_twin(self):
        pw, t_true = self._scene(n=40)
        p = _project_np(INTR, pw + t_true) + RNG.normal(0, 0.5, (40, 2))  # noisy
        x_twin = _twin_nls_t(INTR, p, pw, np.array([0.0, 0.0, 1.0]))
        res = solve_translation(INTR, jnp.asarray(p), jnp.asarray(pw),
                                jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(res.x), x_twin, atol=1e-5)

    def test_pose_rt_recovery_from_plate(self):
        """Frame-0 scenario: 6-DoF from the 4 plate corners."""
        plate = np.asarray(license_plate_points("Chile"), dtype=np.float64)
        rpy_true = np.array([0.03, -0.06, 0.1])
        t_true = np.array([0.2, 0.1, 6.0])
        C = np.asarray(rpy_to_matrix(jnp.asarray(rpy_true)))
        p = _project_np(INTR, plate @ C + t_true)
        pose = estimate_world_camera_pose(
            INTR, jnp.asarray(p), jnp.asarray(plate), find_R=True
        )
        np.testing.assert_allclose(np.asarray(pose.t), t_true, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pose.R), C, atol=1e-6)
        assert float(pose.residual_rms) < 1e-6

    def test_masked_lanes_do_not_affect_solution(self):
        pw, t_true = self._scene(n=30)
        p = _project_np(INTR, pw + t_true)
        # append garbage lanes, masked out
        pw_pad = np.concatenate([pw, RNG.normal(size=(10, 3)) * 100], axis=0)
        p_pad = np.concatenate([p, np.full((10, 2), np.nan)], axis=0)
        # sanitize NaNs as the pipeline does before calling (mask handles the rest)
        p_pad = np.nan_to_num(p_pad, nan=1e4)
        mask = np.concatenate([np.ones(30, bool), np.zeros(10, bool)])
        res = solve_translation(INTR, jnp.asarray(p_pad), jnp.asarray(pw_pad),
                                jnp.array([0.0, 0.0, 1.0]), mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(res.x), t_true, atol=1e-7)

    def test_jit_compiles(self):
        pw, t_true = self._scene(n=16)
        p = _project_np(INTR, pw + t_true)
        f = jax.jit(lambda p, pw: solve_translation(INTR, p, pw, jnp.array([0.0, 0.0, 1.0])).x)
        out = f(jnp.asarray(p), jnp.asarray(pw))
        np.testing.assert_allclose(np.asarray(out), t_true, atol=1e-7)


class TestTriangulation:
    def _rig(self, nf=6, n=50):
        pts = np.concatenate(
            [RNG.uniform(-2, 2, (n, 2)), RNG.uniform(6, 10, (n, 1))], axis=1
        )
        cams = np.stack(
            [np.linspace(0, 1.5, nf), np.zeros(nf), np.linspace(0, 0.3, nf)], axis=1
        )
        rays = np.zeros((nf, n, 3))
        for f in range(nf):
            d = pts - cams[f]
            rays[f] = d / np.linalg.norm(d, axis=1, keepdims=True)
        return pts, cams, rays

    def test_pairwise_exact(self):
        pts, cams, rays = self._rig()
        got = pairwise_intercept(jnp.asarray(cams), jnp.asarray(rays))
        np.testing.assert_allclose(np.asarray(got), pts, atol=1e-9)

    def test_nray_exact(self):
        pts, cams, rays = self._rig()
        got = nray_intercept(jnp.asarray(cams), jnp.asarray(rays))
        np.testing.assert_allclose(np.asarray(got), pts, atol=1e-9)

    def test_pairwise_vs_nray_with_noise(self):
        pts, cams, rays = self._rig()
        noisy = rays + RNG.normal(0, 1e-4, rays.shape)
        noisy /= np.linalg.norm(noisy, axis=2, keepdims=True)
        a = np.asarray(pairwise_intercept(jnp.asarray(cams), jnp.asarray(noisy)))
        b = np.asarray(nray_intercept(jnp.asarray(cams), jnp.asarray(noisy)))
        # different estimators, same neighborhood
        assert np.abs(a - b).max() < 0.02
        assert np.abs(a - pts).max() < 0.05

    def test_masked_nray_partial_histories_and_background(self):
        from velocity_tpu.solvers.triangulate import nray_intercept_masked_np

        intr_np = (1000.0, 1000.0, 640.0, 360.0)
        fx, fy, cx, cy = intr_np
        nf, n = 5, 8
        pts = np.concatenate(
            [RNG.uniform(-2, 2, (n, 2)), RNG.uniform(6, 10, (n, 1))], axis=1)
        tvecs = np.stack([np.zeros(nf), np.zeros(nf),
                          np.linspace(0, 4.0, nf)], axis=1)  # car recedes
        track = np.full((nf, n, 2), np.nan)
        mask = np.zeros((nf, n), bool)
        for f in range(nf):
            pc = pts + tvecs[f]
            track[f, :, 0] = fx * pc[:, 0] / pc[:, 2] + cx
            track[f, :, 1] = fy * pc[:, 1] / pc[:, 2] + cy
            mask[f] = True
        # lane 0 observed only in the last 2 frames (replenished late)
        mask[:3, 0] = False
        track[:3, 0] = np.nan
        # lane 1 is STATIC BACKGROUND: same pixel every frame — consistent
        # only with a point at (near) infinity in the car frame
        track[:, 1, 0] = 700.0
        track[:, 1, 1] = 400.0
        p3, ok = nray_intercept_masked_np(intr_np, track, tvecs, mask)
        idx = np.r_[0, 2:n]
        assert ok[idx].all()
        # near-axial baseline (car recedes along z) is weakly conditioned for
        # triangulation; sub-mm is ample for the pose-solve anchor
        np.testing.assert_allclose(p3[idx], pts[idx], atol=1e-3)
        # the WORLD-static lane's rays are parallel-but-offset in the car
        # frame — self-inconsistent — and must be rejected, not admitted to
        # the pose solve at some arbitrary depth
        assert not ok[1]
        # a lane with a single observation is rejected
        mask1 = mask.copy()
        mask1[:4, 0] = False
        _, ok1 = nray_intercept_masked_np(intr_np, track, tvecs, mask1)
        assert not ok1[0] and ok1[2:].all()
        # depth plausibility band rejects out-of-band lanes
        _, ok2 = nray_intercept_masked_np(intr_np, track, tvecs, mask,
                                          depth_range=(11.5, 100.0))
        assert not ok2[2:][pts[2:, 2] < 7.5].any()


class TestMSV:
    def test_refine_translation_recovers_camera(self):
        nf, n = 6, 80
        pts = np.concatenate(
            [RNG.uniform(-2, 2, (n, 2)), RNG.uniform(6, 10, (n, 1))], axis=1
        )
        cams = np.stack(
            [np.linspace(0, 1.8, nf), np.linspace(0, 0.1, nf), np.linspace(0, 0.4, nf)],
            axis=1,
        )  # camera positions, cam-0 frame
        pixels = np.zeros((nf, n, 2))
        for f in range(nf):
            pixels[f] = _project_np(INTR, pts - cams[f])
        # driver passes B rows with u0 = B0 - Bf = cam_f - cam_0 => B_f = -cam_f
        origins = -cams
        mask = np.ones(n, bool)
        res = msv_refine_translation(
            INTR, jnp.asarray(pixels), jnp.asarray(mask), jnp.asarray(origins),
            SolverConfig(max_iters_msv=300),
        )
        x_true = -(cams[-1] - cams[0])
        np.testing.assert_allclose(np.asarray(res.t), x_true, atol=1e-6)
        # cloud is expressed relative to the newest camera
        np.testing.assert_allclose(np.asarray(res.points), pts - cams[-1], atol=1e-5)
        assert float(res.residual_rms) < 1e-6

    def test_masked_lanes_sanitized(self):
        """NaN pixels in masked lanes must not poison the solve."""
        nf, n = 4, 20
        pts = np.concatenate(
            [RNG.uniform(-1, 1, (n, 2)), RNG.uniform(5, 8, (n, 1))], axis=1
        )
        cams = np.stack([np.linspace(0, 1, nf), np.zeros(nf), np.zeros(nf)], axis=1)
        pixels = np.zeros((nf, n, 2))
        for f in range(nf):
            pixels[f] = _project_np(INTR, pts - cams[f])
        mask = np.ones(n, bool)
        mask[-5:] = False
        pixels[:, -5:, :] = np.nan
        res = msv_refine_translation(
            INTR, jnp.asarray(pixels), jnp.asarray(mask), jnp.asarray(-cams),
            SolverConfig(max_iters_msv=300),
        )
        assert np.isfinite(np.asarray(res.t)).all()
        np.testing.assert_allclose(np.asarray(res.t), -(cams[-1] - cams[0]), atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestLinearInit:
    """planar_pose (extrinsicsPlanar parity) and rotation_lsq (fcnLS_R)."""

    def test_planar_pose_exact(self):
        from velocity_tpu.solvers.linear_init import planar_pose
        from velocity_tpu.geometry import license_plate_points

        plate = np.asarray(license_plate_points("Chile"), np.float64)
        extra = np.concatenate(
            [RNG.uniform(-0.18, 0.18, (8, 1)), RNG.uniform(-0.06, 0.06, (8, 1)),
             np.zeros((8, 1))], axis=1)
        pts = np.concatenate([plate, extra])
        rpy = np.array([0.4, 0.35, 0.25])
        t_true = np.array([1.5, 0.45, 3.6])
        C = np.asarray(rpy_to_matrix(jnp.asarray(rpy)))
        p = _project_np(INTR, pts @ C + t_true)
        R, t = planar_pose(INTR, jnp.asarray(p), jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(R), C, atol=1e-10)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-10)

    def test_rotation_lsq_exact(self):
        from velocity_tpu.solvers.linear_init import rotation_lsq

        C = np.asarray(rpy_to_matrix(jnp.asarray([0.1, -0.2, 0.3])))
        dirs = RNG.normal(size=(30, 3))
        dirs[:, 2] = np.abs(dirs[:, 2]) + 2
        p = _project_np(INTR, dirs @ C)
        R = rotation_lsq(INTR, jnp.asarray(p), jnp.asarray(dirs))
        np.testing.assert_allclose(np.asarray(R), C, atol=1e-12)
