"""Pallas patch-extraction kernel vs the XLA extractor (interpret mode on CPU,
compiled on TPU via RUN_TPU_TESTS)."""

import numpy as np
import jax.numpy as jnp
import pytest

from velocity_tpu.ops.lk_fast import _extract_axis_aligned
from velocity_tpu.ops.patch_pallas import extract_patches_pallas

RNG = np.random.default_rng(17)


class TestExtractInterpret:
    def test_matches_xla_extractor(self):
        img = jnp.asarray(RNG.uniform(0, 255, (240, 320)).astype(np.float32))
        corners = jnp.asarray(
            np.stack([RNG.integers(-10, 300, 40), RNG.integers(-10, 220, 40)], 1),
            jnp.int32,
        )
        want, cl_want = _extract_axis_aligned(img, corners, 32)
        got, cl = extract_patches_pallas(img, corners, 32, interpret=True)
        np.testing.assert_array_equal(np.asarray(cl), np.asarray(cl_want))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_border_clamping(self):
        img = jnp.asarray(np.arange(100 * 128, dtype=np.float32).reshape(100, 128))
        corners = jnp.asarray([[120, 95], [-5, -5]], jnp.int32)
        got, cl = extract_patches_pallas(img, corners, 16, interpret=True)
        assert np.asarray(cl).tolist() == [[112, 84], [0, 0]]
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(img[:16, :16]))


@pytest.mark.tpu
class TestExtractCompiled:
    def test_compiled_on_tpu(self):
        img = jnp.asarray(RNG.uniform(0, 255, (512, 640)).astype(np.float32))
        corners = jnp.asarray(
            np.stack([RNG.integers(0, 560, 128), RNG.integers(0, 430, 128)], 1),
            jnp.int32,
        )
        want, _ = _extract_axis_aligned(img, corners, 72)
        got, _ = extract_patches_pallas(img, corners, 72)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
