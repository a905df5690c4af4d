"""Fused LK iteration-block Pallas kernel == XLA reference block.

Runs the kernel in interpreter mode (works off-TPU) against
ops/lk_lanes.py:block_iters_ref on randomized inputs covering both the
linear (stage-1/2) and cubic warped (stage-3) configurations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from velocity_tpu.ops.lk_lanes import block_iters_ref
from velocity_tpu.ops.lk_block_pallas import lk_block


def _case(win, P, n_taps, cubic, N=256, seed=0, it0=0, some_done=False):
    rng = np.random.default_rng(seed)
    dpatch = jnp.asarray(rng.random((P, P, N)).astype(np.float32) * 255)
    Ip = jnp.asarray(rng.random((win, win, N)).astype(np.float32) * 255)
    gxp = jnp.asarray(rng.normal(0, 20, (win, win, N)).astype(np.float32))
    gyp = jnp.asarray(rng.normal(0, 20, (win, win, N)).astype(np.float32))
    a11 = jnp.sum(gxp * gxp, axis=(0, 1))
    a12 = jnp.sum(gxp * gyp, axis=(0, 1))
    a22 = jnp.sum(gyp * gyp, axis=(0, 1))
    det = a11 * a22 - a12 * a12
    inv_det = jnp.where(det != 0, 1.0 / det, 0.0)
    pts = jnp.asarray(rng.uniform(50, 400, (2, N)).astype(np.float32))
    bx = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32)) - pts[0] + (
        (n_taps - 1) / 2 + (win - 1) / 2)
    by = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32)) - pts[1] + (
        (n_taps - 1) / 2 + (win - 1) / 2)
    trackable = jnp.asarray(rng.random(N) > 0.1)
    done = (jnp.asarray(rng.random(N) > 0.7) if some_done
            else jnp.zeros(N, bool))
    pd = jnp.asarray(rng.normal(0, 0.2, (2, N)).astype(np.float32))
    kw = dict(win=win, n_taps=n_taps, cubic=cubic, eps=0.01, Wd=480, Hd=270)
    return (dpatch, Ip, gxp, gyp, a11, a12, a22, inv_det, bx, by,
            trackable, pts, done, pd, it0), kw


@pytest.mark.parametrize("win,P,n_taps,cubic,it0", [
    (15, 24, 8, False, 0),
    (15, 24, 8, False, 5),
    (51, 64, 10, True, 0),
])
def test_kernel_matches_reference(win, P, n_taps, cubic, it0):
    args, kw = _case(win, P, n_taps, cubic, it0=it0, some_done=(it0 > 0))
    (dpatch, Ip, gxp, gyp, a11, a12, a22, inv_det, bx, by,
     trackable, pts, done, pd, it0v) = args
    ref_p, ref_d, ref_pd = block_iters_ref(
        dpatch, Ip, gxp, gyp, a11, a12, a22, inv_det, bx, by,
        trackable, pts, done, pd, it0v, **kw)
    got_p, got_d, got_pd = lk_block(
        dpatch, Ip, gxp, gyp, a11, a12, a22, inv_det, bx, by,
        trackable.astype(jnp.float32), pts, done.astype(jnp.float32), pd,
        it0v, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_d) > 0.5, np.asarray(ref_d))
    np.testing.assert_allclose(np.asarray(got_pd), np.asarray(ref_pd),
                               rtol=1e-5, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
