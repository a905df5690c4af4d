"""LK tracker tests against OpenCV oracles (synthetic + real reference frames)."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from velocity_tpu.ops import (
    bilinear_sample,
    pyr_down,
    resize_nearest,
    lk_pyramidal,
    lk_forward_backward,
)

RNG = np.random.default_rng(3)


def _smooth_image(h=240, w=320, blur=9):
    img = RNG.uniform(0, 255, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (blur, blur), 0)
    return img


def _interior_points(h, w, n, margin=40):
    pts = np.stack(
        [RNG.uniform(margin, w - margin, n), RNG.uniform(margin, h - margin, n)],
        axis=1,
    ).astype(np.float32)
    return pts


class TestPrimitives:
    def test_bilinear_matches_remap(self):
        img = _smooth_image()
        h, w = img.shape
        xs = RNG.uniform(1, w - 2, 200).astype(np.float32)
        ys = RNG.uniform(1, h - 2, 200).astype(np.float32)
        want = cv2.remap(img, xs[None, :], ys[None, :], cv2.INTER_LINEAR).ravel()
        got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_pyr_down_matches_cv2(self):
        img = _smooth_image(101, 157)  # odd sizes stress the (n+1)//2 rule
        want = cv2.pyrDown(img)
        got = np.asarray(pyr_down(jnp.asarray(img)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-2)

    def test_resize_nearest_matches_cv2(self):
        img = (RNG.uniform(0, 255, (1080, 1920))).astype(np.uint8)
        want = cv2.resize(img, (0, 0), fx=0.25, fy=0.25, interpolation=cv2.INTER_NEAREST)
        got = np.asarray(resize_nearest(jnp.asarray(img), 0.25))
        np.testing.assert_array_equal(got, want)


def _cv2_lk(im1, im2, pts, win, level, iters, eps):
    p2, v, _ = cv2.calcOpticalFlowPyrLK(
        im1.astype(np.uint8),
        im2.astype(np.uint8),
        pts[None].astype(np.float32),
        None,
        winSize=(win, win),
        maxLevel=level,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, iters, eps),
    )
    return p2[0], v.ravel().astype(bool)


class TestLKSynthetic:
    def test_pure_translation_subpixel(self):
        img = _smooth_image()
        shift = np.array([3.3, -2.7], dtype=np.float32)
        M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
        img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
        pts = _interior_points(*img.shape, 50)
        res = lk_pyramidal(
            jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts),
            win=15, max_level=3, iters=30, eps=0.001,
        )
        got = np.asarray(res.points)
        ok = np.asarray(res.status)
        assert ok.mean() > 0.9
        err = np.linalg.norm(got[ok] - (pts[ok] + shift), axis=1)
        assert np.median(err) < 0.1, np.median(err)

    def test_matches_cv2_positions(self):
        img = _smooth_image()
        M = np.float32([[1, 0, 4.6], [0, 1, -3.2]])
        img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
        pts = _interior_points(*img.shape, 60)
        win, lvl, it, eps = 15, 3, 10, 0.1
        cvp, cvv = _cv2_lk(img, img2, pts, win, lvl, it, eps)
        res = lk_pyramidal(
            jnp.asarray(img.astype(np.uint8).astype(np.float32)),
            jnp.asarray(img2.astype(np.uint8).astype(np.float32)),
            jnp.asarray(pts), win=win, max_level=lvl, iters=it, eps=eps,
        )
        got, st = np.asarray(res.points), np.asarray(res.status)
        both = cvv & st
        assert both.mean() > 0.85
        d = np.linalg.norm(got[both] - cvp[both], axis=1)
        assert np.median(d) < 0.15, (np.median(d), d.max())

    def test_warp_dst_prior_equals_plain_on_translated(self):
        """Tracking through an exact translation prior should find ~zero residual flow."""
        img = _smooth_image()
        shift = np.float32([7.0, -5.0])
        M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
        img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
        pts = _interior_points(*img.shape, 40)
        res = lk_pyramidal(
            jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts),
            win=21, max_level=2, iters=30, eps=0.001,
            warp_dst=jnp.asarray(M),
        )
        got = np.asarray(res.points)
        ok = np.asarray(res.status)
        # solved coords live in source frame: residual motion ~ 0
        err = np.linalg.norm(got[ok] - pts[ok], axis=1)
        assert np.median(err) < 0.05, np.median(err)

    def test_fb_gate_kills_occluded(self):
        img = _smooth_image()
        img2 = img.copy()
        img2[:, 160:] = RNG.uniform(0, 255, (img.shape[0], 160))  # destroy right half
        pts = _interior_points(*img.shape, 60)
        res = lk_forward_backward(
            jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts),
            fb_threshold=0.3, win=15, max_level=3, iters=30, eps=0.001,
        )
        st = np.asarray(res.status)
        left = pts[:, 0] < 130
        right = pts[:, 0] > 190
        assert st[left].mean() > 0.8
        assert st[right].mean() < 0.2

    def test_status_false_out_of_bounds(self):
        img = _smooth_image()
        pts = np.float32([[5.0, 5.0], [-20.0, 50.0], [310.0, 230.0]])
        res = lk_pyramidal(jnp.asarray(img), jnp.asarray(img), jnp.asarray(pts),
                           win=15, max_level=2, iters=10, eps=0.1)
        assert np.asarray(res.status)[1] == False  # noqa: E712


@pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference/data/IMG_4134.MOV").exists(),
    reason="dataset not mounted",
)
class TestLKRealFrames:
    @classmethod
    def setup_class(cls):
        cap = cv2.VideoCapture("/root/reference/data/IMG_4134.MOV")
        cap.set(cv2.CAP_PROP_POS_FRAMES, 19)
        ok1, f1 = cap.read()
        ok2, f2 = cap.read()
        cap.release()
        assert ok1 and ok2
        cls.im1 = cv2.cvtColor(f1, cv2.COLOR_BGR2GRAY)
        cls.im2 = cv2.cvtColor(f2, cv2.COLOR_BGR2GRAY)
        corners = cv2.goodFeaturesToTrack(cls.im1, 200, 0.01, 10, blockSize=5)
        cls.pts = corners.squeeze(1).astype(np.float32)

    def test_quarter_scale_coarse_vs_cv2(self):
        """The reference's stage-1 configuration on real video frames."""
        s1 = cv2.resize(self.im1, (0, 0), fx=0.25, fy=0.25, interpolation=cv2.INTER_NEAREST)
        s2 = cv2.resize(self.im2, (0, 0), fx=0.25, fy=0.25, interpolation=cv2.INTER_NEAREST)
        pts = self.pts * 0.25
        cvp, cvv = _cv2_lk(s1, s2, pts, 15, 4, 10, 0.1)
        res = lk_pyramidal(
            jnp.asarray(s1.astype(np.float32)), jnp.asarray(s2.astype(np.float32)),
            jnp.asarray(pts), win=15, max_level=4, iters=10, eps=0.1,
        )
        got, st = np.asarray(res.points), np.asarray(res.status)
        both = cvv & st
        assert both.mean() > 0.75, both.mean()
        d = np.linalg.norm(got[both] - cvp[both], axis=1)
        assert np.median(d) < 0.25, np.median(d)
        # status agreement
        assert (cvv == st).mean() > 0.8, (cvv == st).mean()

    def test_fine_51_window_vs_cv2(self):
        """Stage-3 configuration: 51x51 single level."""
        cvp, cvv = _cv2_lk(self.im1, self.im2, self.pts, 51, 0, 30, 0.001)
        res = lk_pyramidal(
            jnp.asarray(self.im1.astype(np.float32)),
            jnp.asarray(self.im2.astype(np.float32)),
            jnp.asarray(self.pts), win=51, max_level=0, iters=30, eps=0.001,
        )
        got, st = np.asarray(res.points), np.asarray(res.status)
        both = cvv & st
        assert both.mean() > 0.7, both.mean()
        d = np.linalg.norm(got[both] - cvp[both], axis=1)
        assert np.median(d) < 0.2, (np.median(d), np.percentile(d, 90))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
