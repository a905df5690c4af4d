"""Pallas TPU kernel: batched patch extraction by per-point DMA.

The fast LK path (ops/lk_fast.py) needs one (P, P) patch per tracked point per
pyramid level — the only memory-irregular access left in the tracker. XLA
lowers the vmapped ``dynamic_slice`` to a gather executed on the scalar core;
this kernel instead issues one direct HBM->VMEM DMA per point with the corner
offsets scalar-prefetched into SMEM, which is exactly what the DMA engines are
for. Grid programs pipeline: program i+1's copy overlaps program i's epilogue.

Falls back transparently (``available()``) off-TPU; numerics are identical to
the XLA path (same clamped-corner convention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _extract_kernel(corners_ref, img_ref, out_ref, sem):
    i = pl.program_id(0)
    cy = corners_ref[i, 1]
    cx = corners_ref[i, 0]
    size = out_ref.shape[-1]
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(cy, size), pl.ds(cx, size)],
        out_ref.at[0],
        sem,
    )
    dma.start()
    dma.wait()


@partial(jax.jit, static_argnames=("size", "interpret"))
def extract_patches_pallas(img, corners, size: int, interpret: bool = False):
    """(N, size, size) patches of ``img`` at integer ``corners`` (N, 2) xy.

    Corners are clamped into the image like the XLA extractor; returns the
    patches and the clamped corners.
    """
    H, W = img.shape
    img = img.astype(jnp.float32)
    cy = jnp.clip(corners[:, 1], 0, H - size).astype(jnp.int32)
    cx = jnp.clip(corners[:, 0], 0, W - size).astype(jnp.int32)
    cl = jnp.stack([cx, cy], axis=1)
    N = corners.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, size, size), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    patches = pl.pallas_call(
        _extract_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, size, size), jnp.float32),
        interpret=interpret,
    )(cl, img)
    return patches, cl


_AVAILABLE: bool | None = None


def available() -> bool:
    """True when the kernel compiles and runs on the current default backend."""
    global _AVAILABLE
    if _AVAILABLE is None:
        try:
            img = jnp.arange(64.0 * 128).reshape(64, 128)
            c = jnp.asarray([[3, 5], [40, 20]], jnp.int32)
            p, _ = extract_patches_pallas(img, c, 16)
            _AVAILABLE = bool(jnp.isfinite(p).all())
        except Exception:
            _AVAILABLE = False
    return _AVAILABLE
