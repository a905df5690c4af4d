"""Harris corners, subpixel refinement, RANSAC affine, sigma rejection, warp tests vs cv2."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from velocity_tpu.ops import (
    harris_response,
    good_features,
    corner_subpix,
    estimate_affine_ransac,
    fit_affine_lsq,
    sigma_rejection,
    affine_warp,
)

RNG = np.random.default_rng(11)


def _checkerboardish(h=240, w=320):
    img = RNG.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
    img = cv2.GaussianBlur(img, (3, 3), 0)
    return img.astype(np.uint8)


class TestHarris:
    def test_response_matches_cv2(self):
        img = _checkerboardish()
        want = cv2.cornerHarris(img, blockSize=5, ksize=3, k=0.04)
        got = np.asarray(harris_response(jnp.asarray(img), block=5, k=0.04))
        # compare away from borders (border handling differs at the edge ring)
        w, g = want[5:-5, 5:-5], got[5:-5, 5:-5]
        np.testing.assert_allclose(g, w, atol=np.abs(w).max() * 1e-4)

    def test_good_features_overlap_cv2(self):
        img = _checkerboardish()
        cvc = cv2.goodFeaturesToTrack(img, 200, 0.01, 0, blockSize=5, useHarrisDetector=True)
        cvc = cvc.squeeze(1)
        got = good_features(jnp.asarray(img), max_corners=200, quality_level=0.01, block=5)
        gpts = np.asarray(got.points)[np.asarray(got.valid)]
        # most cv2 corners should appear in ours (within 1px)
        d = np.linalg.norm(cvc[:, None, :] - gpts[None, :, :], axis=2).min(axis=1)
        assert (d <= 1.0).mean() > 0.9, (d <= 1.0).mean()

    def test_ordering_is_by_response(self):
        img = _checkerboardish()
        got = good_features(jnp.asarray(img), max_corners=64)
        r = np.asarray(got.response)[np.asarray(got.valid)]
        assert (np.diff(r) <= 1e-9).all()

    def test_corner_subpix_close_to_cv2(self):
        img = _checkerboardish()
        cvc = cv2.goodFeaturesToTrack(img, 50, 0.01, 10, blockSize=5, useHarrisDetector=True)
        pts = cvc.squeeze(1).astype(np.float32)
        want = cv2.cornerSubPix(
            img, pts.copy(), (5, 5), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 100, 0.001),
        )
        got = np.asarray(corner_subpix(jnp.asarray(img.astype(np.float32)),
                                       jnp.asarray(pts), half_win=5))
        d = np.linalg.norm(got - want, axis=1)
        assert np.median(d) < 0.1, (np.median(d), np.percentile(d, 90))
        # both should stay near the integer detections
        assert np.linalg.norm(got - pts, axis=1).max() < 6.5


class TestRansacAffine:
    def _data(self, n=120, outlier_frac=0.25):
        src = RNG.uniform(0, 300, (n, 2))
        M = np.array([[1.01, 0.02, 5.0], [-0.015, 0.99, -3.0]])
        dst = src @ M[:, :2].T + M[:, 2] + RNG.normal(0, 0.3, (n, 2))
        n_out = int(n * outlier_frac)
        out_idx = RNG.choice(n, n_out, replace=False)
        dst[out_idx] += RNG.uniform(20, 60, (n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))
        inl_true = np.ones(n, bool)
        inl_true[out_idx] = False
        return src.astype(np.float64), dst.astype(np.float64), M, inl_true

    def test_recovers_model_with_outliers(self):
        src, dst, M, inl_true = self._data()
        res = estimate_affine_ransac(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(res.M), M, atol=0.05)
        got_inl = np.asarray(res.inliers)
        assert (got_inl == inl_true).mean() > 0.95

    def test_agrees_with_cv2(self):
        src, dst, M, _ = self._data()
        Mcv, inlcv = cv2.estimateAffine2D(src, dst, method=cv2.RANSAC)
        res = estimate_affine_ransac(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(res.M), Mcv, atol=0.05)
        agree = (np.asarray(res.inliers) == inlcv.ravel().astype(bool)).mean()
        assert agree > 0.9, agree

    def test_masked_lanes_excluded(self):
        src, dst, M, _ = self._data(n=80, outlier_frac=0.0)
        mask = np.ones(100, bool); mask[80:] = False
        src_p = np.concatenate([src, np.full((20, 2), np.nan)], 0)
        dst_p = np.concatenate([dst, np.full((20, 2), np.nan)], 0)
        src_p, dst_p = np.nan_to_num(src_p, nan=1e6), np.nan_to_num(dst_p, nan=-1e6)
        res = estimate_affine_ransac(jnp.asarray(src_p), jnp.asarray(dst_p),
                                     mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(res.M), M, atol=0.15)
        assert not np.asarray(res.inliers)[80:].any()

    def test_lsq_exact_on_clean_data(self):
        src = RNG.uniform(0, 100, (30, 2))
        M = np.array([[0.9, 0.1, 2.0], [-0.1, 1.1, 7.0]])
        dst = src @ M[:, :2].T + M[:, 2]
        got = np.asarray(fit_affine_lsq(jnp.asarray(src), jnp.asarray(dst),
                                        jnp.ones(30)))
        np.testing.assert_allclose(got, M, atol=1e-8)

    def test_jit_and_determinism(self):
        src, dst, _, _ = self._data()
        f = jax.jit(lambda s, d: estimate_affine_ransac(s, d).M)
        a = np.asarray(f(jnp.asarray(src), jnp.asarray(dst)))
        b = np.asarray(f(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_array_equal(a, b)


class TestRobust:
    def test_sigma_rejection_matches_reference_semantics(self):
        x = np.concatenate([RNG.normal(0, 1, 500), np.array([25.0, -31.0, 40.0])])
        v = np.asarray(sigma_rejection(jnp.asarray(x), srl=3.0, iterations=3))
        assert not v[-3:].any()
        assert v[:500].mean() > 0.97

        # numpy twin (reference algorithm on compacted arrays)
        xx = x.copy(); vv = np.ones_like(x, bool)
        for _ in range(3):
            s = xx.std() * 3.0; mu = xx.mean()
            keep = (xx < mu + s) & (xx > mu - s)
            xx = xx[keep]
            vv[vv] = keep
        np.testing.assert_array_equal(v, vv)


class TestWarp:
    def test_matches_cv2_remap(self):
        img = _checkerboardish().astype(np.float32)
        M = np.array([[1.02, 0.01, 3.0], [-0.02, 0.98, -2.0]], np.float32)
        h, w = 100, 140
        ox, oy = 30, 40
        x, y = np.meshgrid(np.arange(ox, ox + w, dtype=np.float32),
                           np.arange(oy, oy + h, dtype=np.float32))
        xm = x * M[0, 0] + y * M[0, 1] + M[0, 2]
        ym = x * M[1, 0] + y * M[1, 1] + M[1, 2]
        want = cv2.remap(img, xm, ym, cv2.INTER_LINEAR)
        got = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(M), (h, w),
                                     offset=(ox, oy)))
        np.testing.assert_allclose(got, want, atol=1e-2)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
