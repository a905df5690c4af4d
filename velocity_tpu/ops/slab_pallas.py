"""Pallas TPU kernel: batched integer-corner slab extraction by per-point DMA.

The lanes-last LK engine (ops/lk_lanes.py) needs one (S, S) image slab per
tracked point per (re)anchor — the only memory-irregular access in the
tracker. XLA lowers the vmapped ``dynamic_slice`` to a gather that costs
~1.5 ms per 1024-point extraction on v5e; this kernel issues one aligned
HBM->VMEM DMA per grid program and resolves the sub-tile offset on-chip,
measuring ~0.04 ms for the same extraction (~30x).

TPU constraints shape the design: HBM memref slices must be tile-aligned
((8, 128) for f32), so each program DMAs the aligned superslab
``img[cy8 : cy8+SH, cx128 : cx128+SW]`` into VMEM scratch, then shifts the
residual offset (ry, rx) = (cy - cy8, cx - cx128) with ``pltpu.roll`` (lane/
sublane rotates) and writes the ``(S, S)`` window. Callers guarantee
``H % 8 == 0 and W % 128 == 0`` (see ``pad_aligned``).

Grid programs pipeline: program i+1's DMA overlaps program i's roll+write.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

_HAVE_PALLAS = True
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover - pallas always importable on jax>=0.4
    _HAVE_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_aligned(img, pad: int):
    """Edge-pad by >= ``pad`` on every side, with the top/left pad exactly
    ``pad`` and the final dims rounded to the (8, 128) f32 HBM tile, so the
    padded image is directly DMA-sliceable by the kernel."""
    H, W = img.shape
    Hp = _round_up(H + 2 * pad, 8)
    Wp = _round_up(W + 2 * pad, 128)
    return jnp.pad(img, ((pad, Hp - H - pad), (pad, Wp - W - pad)), mode="edge")


def use_pallas() -> bool:
    """Slab DMA kernel usable on the current default backend?"""
    if not _HAVE_PALLAS or os.environ.get("VELOCITY_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def _kernel(meta_ref, img_ref, out_ref, scratch, sem):
    i = pl.program_id(0)
    cy8 = pl.multiple_of(meta_ref[i, 0], 8)
    cx128 = pl.multiple_of(meta_ref[i, 1], 128)
    SH, SW = scratch.shape
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(cy8, SH), pl.ds(cx128, SW)], scratch, sem
    )
    dma.start()
    dma.wait()
    ry = meta_ref[i, 2]
    rx = meta_ref[i, 3]
    S = out_ref.shape[-1]
    shifted = pltpu.roll(pltpu.roll(scratch[:], -rx, 1), -ry, 0)
    out_ref[0] = shifted[:S, :S]


@partial(jax.jit, static_argnames=("size",))
def extract_slabs_dma(img, cx, cy, size: int):
    """(N, size, size) f32 slabs ``img[cy[n]:cy[n]+size, cx[n]:cx[n]+size]``.

    ``img`` must be f32 with H % 8 == 0, W % 128 == 0 (see ``pad_aligned``);
    ``cx, cy`` must be pre-clamped int32 in [0, W-size] / [0, H-size].
    """
    H, W = img.shape
    # pltpu.roll with a *dynamic* shift only rotates correctly on
    # power-of-two dims (observed on v5e: SH=32 exact, SH=40/48/80 garbage),
    # so round the scratch slab up to powers of two on both axes
    SH = 1 << (_round_up(size, 8) + 8 - 1).bit_length()
    SW = 1 << (_round_up(size + 128, 128) - 1).bit_length()
    if H < SH or W < SW:  # tiny image (top pyramid levels): XLA path is fine
        def one(cyi, cxi):
            return jax.lax.dynamic_slice(img, (cyi, cxi), (size, size))

        return jax.vmap(one)(cy, cx)

    cy8 = jnp.minimum((cy // 8) * 8, H - SH)
    cx128 = jnp.minimum((cx // 128) * 128, W - SW)
    meta = jnp.stack([cy8, cx128, cy - cy8, cx - cx128], axis=1).astype(jnp.int32)
    N = cx.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, size, size), lambda i, m: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((SH, SW), jnp.float32), pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, size, size), jnp.float32),
    )(meta, img.astype(jnp.float32))
