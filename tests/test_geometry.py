"""Geometry core tests against independent numpy oracles and round-trip identities."""

import numpy as np
import jax.numpy as jnp
import pytest

from velocity_tpu.geometry import (
    rpy_to_matrix,
    matrix_to_rpy,
    rotate_translate,
    Intrinsics,
    project_camera_points,
    world_to_image,
    image_to_world_plane,
    pixel_to_unit_ray,
    pixel_to_angle,
    cartesian_to_spherical,
    spherical_to_cartesian,
    elevation_azimuth,
    license_plate_points,
    norm,
    rms,
    unit_rows,
)
from velocity_tpu.geometry.geodesy import (
    lla_to_ecef,
    ecef_to_lla,
    ecef_to_ned,
    ned_to_ecef,
)

RNG = np.random.default_rng(0)


def _oracle_rpy2dcm(rpy):
    """Independent oracle: aerospace ZYX DCM composed from per-axis rotations.

    With the per-axis body-frame matrices below, the reference DCM satisfies
    C = (Rx(roll) @ Ry(pitch) @ Rz(yaw)).T — i.e. the body-to-world ZYX
    composition transposed into the row-vector convention (x_world_rows @ C).
    """
    r, p, y = rpy
    Rx = np.array([[1, 0, 0], [0, np.cos(r), np.sin(r)], [0, -np.sin(r), np.cos(r)]])
    Ry = np.array([[np.cos(p), 0, -np.sin(p)], [0, 1, 0], [np.sin(p), 0, np.cos(p)]])
    Rz = np.array([[np.cos(y), np.sin(y), 0], [-np.sin(y), np.cos(y), 0], [0, 0, 1]])
    return (Rx @ Ry @ Rz).T


class TestRotations:
    def test_rpy_to_matrix_matches_axis_composition(self):
        for _ in range(20):
            rpy = RNG.uniform(-1.2, 1.2, 3)
            C = np.asarray(rpy_to_matrix(jnp.asarray(rpy)))
            np.testing.assert_allclose(C, _oracle_rpy2dcm(rpy), atol=1e-12)

    def test_orthonormal(self):
        rpy = jnp.asarray(RNG.uniform(-np.pi, np.pi, (50, 3)))
        C = rpy_to_matrix(rpy)
        eye = jnp.broadcast_to(jnp.eye(3), C.shape)
        np.testing.assert_allclose(C @ jnp.swapaxes(C, -1, -2), eye, atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(np.asarray(C)), 1.0, atol=1e-12)

    def test_roundtrip(self):
        rpy = RNG.uniform(-1.2, 1.2, (100, 3))  # within atan/asin principal range
        C = rpy_to_matrix(jnp.asarray(rpy))
        rpy2 = matrix_to_rpy(C)
        np.testing.assert_allclose(np.asarray(rpy2), rpy, atol=1e-10)

    def test_rotate_translate(self):
        pts = RNG.normal(size=(7, 3))
        rpy = RNG.uniform(-1, 1, 3)
        t = RNG.normal(size=3)
        got = rotate_translate(jnp.asarray(pts), jnp.asarray(rpy), jnp.asarray(t))
        want = pts @ _oracle_rpy2dcm(rpy) + t
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def _random_intrinsics():
    fx, fy = RNG.uniform(1000, 4000, 2)
    cx, cy = RNG.uniform(500, 2000, 2)
    return Intrinsics(
        fx=jnp.float64(fx), fy=jnp.float64(fy), cx=jnp.float64(cx),
        cy=jnp.float64(cy), skew=jnp.float64(0.0),
    )


class TestProjection:
    def test_project_equals_rowvec_matmul(self):
        """project_camera_points == pscale(a @ K) with the MATLAB-layout K."""
        intr = _random_intrinsics()
        K = np.asarray(intr.matrix_rowvec(dtype=jnp.float64))
        a = RNG.normal(size=(40, 3)) + np.array([0, 0, 10.0])
        want = (a @ K)[:, 0:2] / (a @ K)[:, 2:3]
        got = project_camera_points(intr, jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)

    def test_from_matrix_roundtrip(self):
        intr = _random_intrinsics()
        K = intr.matrix_rowvec(dtype=jnp.float64)
        intr2 = Intrinsics.from_matrix_rowvec(K)
        for a, b in zip(intr, intr2):
            np.testing.assert_allclose(float(a), float(b))

    def test_world_to_image_to_world_plane_roundtrip(self):
        """Backprojecting projections of z=0-plane points recovers their xy."""
        intr = _random_intrinsics()
        rpy = RNG.uniform(-0.3, 0.3, 3)
        C = rpy_to_matrix(jnp.asarray(rpy))
        t = jnp.asarray([0.1, -0.2, 5.0])
        pw = np.concatenate([RNG.uniform(-1, 1, (30, 2)), np.zeros((30, 1))], axis=1)
        p = world_to_image(intr, C, t, jnp.asarray(pw))
        xy = image_to_world_plane(intr, C, t, p)
        np.testing.assert_allclose(np.asarray(xy), pw[:, 0:2], atol=1e-9)

    def test_pixel_to_unit_ray(self):
        intr = _random_intrinsics()
        p = RNG.uniform(0, 3000, (20, 2))
        u = np.asarray(pixel_to_unit_ray(intr, jnp.asarray(p)))
        np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1.0, atol=1e-12)
        # direction: un-normalized ray is (p - c, fx)
        raw = np.concatenate(
            [p - np.array([float(intr.cx), float(intr.cy)])],
            axis=1,
        )
        raw = np.concatenate([raw, np.full((20, 1), float(intr.fx))], axis=1)
        np.testing.assert_allclose(u, raw / np.linalg.norm(raw, axis=1, keepdims=True), atol=1e-12)

    def test_projection_of_ray_lands_on_pixel(self):
        intr = _random_intrinsics()
        intr = intr._replace(fy=intr.fx)  # pixel_to_unit_ray assumes fx==fy (reference parity)
        p = jnp.asarray(RNG.uniform(100, 2000, (15, 2)))
        u = pixel_to_unit_ray(intr, p)
        p2 = project_camera_points(intr, u * 7.3)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-9)

    def test_pixel_to_angle_shape(self):
        intr = _random_intrinsics()
        ea = pixel_to_angle(intr, jnp.asarray(RNG.uniform(0, 3000, (11, 2))))
        assert ea.shape == (11, 2)


class TestSpherical:
    def test_roundtrip(self):
        x = RNG.normal(size=(64, 3))
        s = cartesian_to_spherical(jnp.asarray(x))
        x2 = spherical_to_cartesian(s)
        np.testing.assert_allclose(np.asarray(x2), x, atol=1e-12)

    def test_elaz_consistent_with_spherical(self):
        x = RNG.normal(size=(16, 3))
        s = np.asarray(cartesian_to_spherical(jnp.asarray(x)))
        ea = np.asarray(elevation_azimuth(jnp.asarray(x)))
        np.testing.assert_allclose(ea, s[:, 1:3], atol=1e-12)


class TestPlate:
    def test_chile_plate(self):
        q = license_plate_points("Chile")
        assert q.shape == (4, 3)
        # width along x, height along y, clockwise from (+,-)
        np.testing.assert_allclose(q[:, 0], [0.18625, 0.18625, -0.18625, -0.18625])
        np.testing.assert_allclose(q[:, 1], [-0.06375, 0.06375, 0.06375, -0.06375])
        np.testing.assert_allclose(q[:, 2], 0)

    def test_eu_default(self):
        q = license_plate_points()
        np.testing.assert_allclose(q[0], [0.260, -0.055, 0])


class TestNorms:
    def test_norm_rms(self):
        x = RNG.normal(size=(5, 4))
        np.testing.assert_allclose(float(norm(jnp.asarray(x))), np.linalg.norm(x))
        np.testing.assert_allclose(float(rms(jnp.asarray(x))), np.sqrt((x**2).mean()))
        u = np.asarray(unit_rows(jnp.asarray(x)))
        np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1.0)


class TestGeodesy:
    def test_lla_ecef_roundtrip(self):
        lla = np.stack(
            [RNG.uniform(-80, 80, 10), RNG.uniform(-179, 179, 10), RNG.uniform(0, 4000, 10)],
            axis=1,
        )
        ecef = lla_to_ecef(lla)
        lla2 = ecef_to_lla(ecef)
        np.testing.assert_allclose(lla2, lla, atol=1e-6)

    def test_known_point(self):
        # Equator/prime meridian at 0 altitude -> (a, 0, 0)
        np.testing.assert_allclose(lla_to_ecef([0.0, 0.0, 0.0]), [6378137.0, 0, 0], atol=1e-6)
        # North pole -> z = b
        np.testing.assert_allclose(
            lla_to_ecef([90.0, 0.0, 0.0]), [0, 0, 6356752.3142], atol=1e-3
        )

    def test_ned_roundtrip_and_orientation(self):
        origin = np.array([-33.45, -70.66, 520.0])  # Santiago-ish
        pts_ned = RNG.normal(size=(8, 3)) * 100
        ecef = ned_to_ecef(pts_ned, origin)
        back = ecef_to_ned(ecef, origin)
        np.testing.assert_allclose(back, pts_ned, atol=1e-8)
        # a point 100m up should be ~[0,0,-100] in NED
        up = lla_to_ecef([origin[0], origin[1], origin[2] + 100.0])
        ned = ecef_to_ned(up, origin)
        np.testing.assert_allclose(ned, [0, 0, -100.0], atol=1e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
