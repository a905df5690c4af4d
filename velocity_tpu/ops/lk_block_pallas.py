"""Pallas TPU kernel: one fused LK iteration block (lanes-last).

The lanes-last LK engine (ops/lk_lanes.py) runs BLOCK_ITERS unrolled
Lucas-Kanade updates per while-loop block. As XLA ops, every tap of the
two-pass sampling stencil materializes a (win, P, N) intermediate, so a
single iteration costs ~0.24 ms despite touching a 2.3 MB patch slab that
fits VMEM whole — ~5% VPU utilization. This kernel runs the ENTIRE block
(BLOCK_ITERS x [sample + structure-tensor solve + update + stop logic])
with the destination slab, source window and gradients resident in VMEM,
grid-partitioned over the point lanes.

Math is line-for-line ops/lk_lanes.py:_level_loop's unrolled body; the
while-loop, per-block re-anchoring DMA extraction, and level setup stay in
XLA. Masks cross the boundary as f32 0/1 (robust across Mosaic bool
handling); the block's start iteration arrives scalar-prefetched (it
gates the oscillation test on the very first iteration).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ITERS = 5  # must match ops/lk_lanes.py
REACH = 3


def _w_linear(a):
    return jnp.maximum(0.0, 1.0 - jnp.abs(a))


def _w_cubic(a):
    d = jnp.abs(a)
    w1 = (1.5 * d - 2.5) * d * d + 1.0
    w2 = ((-0.5 * d + 2.5) * d - 4.0) * d + 2.0
    return jnp.where(d < 1.0, w1, jnp.where(d < 2.0, w2, 0.0))


def _sample_reduce(patch_ref, oy, ox, gx, gy, win: int, n_taps: int,
                   cubic: bool):
    """(sum(Jp*gx), sum(Jp*gy)) over the window, WITHOUT materializing Jp.

    Jp = sum_dy wy * H[dy:dy+win] with H the x-pass accumulation, so
    sum(Jp*g) = sum_dy wy * sum(H[dy:dy+win]*g) — per-tap reductions instead
    of a (win, win, BN) intermediate per iteration. (The win51 slab's
    operands already fill VMEM at 128 lanes; the materialized form overflows
    the Mosaic stack by ~0.6 MB.)
    """
    if cubic:
        lo, hi = 1.0, float(n_taps - 2)
    else:
        lo, hi = 0.0, float(n_taps - 1)
    oy = jnp.clip(oy, lo, max(hi, lo))
    ox = jnp.clip(ox, lo, max(hi, lo))
    w_fn = _w_cubic if cubic else _w_linear
    H = None
    for dx in range(n_taps):
        wx = w_fn(ox - dx)[None, None, :]
        sl = patch_ref[:, dx : dx + win, :]
        H = wx * sl if H is None else H + wx * sl
    s1 = None
    s2 = None
    for dy in range(n_taps):
        wy = w_fn(oy - dy)
        sl = jax.lax.slice_in_dim(H, dy, dy + win, axis=0)
        d1 = wy * jnp.sum(sl * gx, axis=(0, 1))
        d2 = wy * jnp.sum(sl * gy, axis=(0, 1))
        s1 = d1 if s1 is None else s1 + d1
        s2 = d2 if s2 is None else s2 + d2
    return s1, s2


def _make_kernel(win: int, n_taps: int, cubic: bool, eps: float,
                 Wd: int, Hd: int):
    half = (win - 1) * 0.5
    eps2 = eps * eps
    if cubic:
        lo, hi = 1.0, float(n_taps - 2)
    else:
        lo, hi = 0.0, float(n_taps - 1)

    def kernel(it0_ref, dpatch, Ip, gxp, gyp, a11, a12, a22, inv_det,
               bx, by, trackable, pts_in, done_in, pd_in,
               pts_out, done_out, pd_out):
        # per-point vectors arrive as (1, BN) — Mosaic requires 2D operands
        # whose layout tiles match XLA's ((8,128); a blocked 1D f32[N] is
        # rejected with a T(1024)-vs-T(256) layout mismatch)
        it0 = it0_ref[0]
        px = pts_in[0, :]
        py = pts_in[1, :]
        done = done_in[0, :]
        pdx = pd_in[0, :]
        pdy = pd_in[1, :]
        trk = trackable[0, :]
        a11v, a12v, a22v = a11[0, :], a12[0, :], a22[0, :]
        idet = inv_det[0, :]
        bxv, byv = bx[0, :], by[0, :]
        gx = gxp[:]
        gy = gyp[:]
        I0 = Ip[:]
        # constant part of b = sum((Jp - I0) * g): hoisted out of the loop
        c1 = jnp.sum(I0 * gx, axis=(0, 1))
        c2 = jnp.sum(I0 * gy, axis=(0, 1))

        for j in range(BLOCK_ITERS):
            ox = px - half + bxv
            oy = py - half + byv
            clamped = ((ox < lo) | (ox > hi) | (oy < lo) | (oy > hi)
                       ).astype(jnp.float32)
            s1, s2 = _sample_reduce(dpatch, oy, ox, gx, gy, win, n_taps, cubic)
            b1 = s1 - c1
            b2 = s2 - c2
            dx_ = -(a22v * b1 - a12v * b2) * idet
            dy_ = -(a11v * b2 - a12v * b1) * idet
            dx_ = jnp.clip(dx_, -REACH, REACH)
            dy_ = jnp.clip(dy_, -REACH, REACH)

            inx = jnp.floor(px - half)
            iny = jnp.floor(py - half)
            in_ok = ((inx >= -win) & (iny >= -win) & (inx < Wd) & (iny < Hd)
                     ).astype(jnp.float32)
            active = (1.0 - done) * trk * in_ok
            px = px + active * dx_
            py = py + active * dy_
            small = (dx_ * dx_ + dy_ * dy_ <= eps2).astype(jnp.float32)
            osc_v = ((jnp.abs(dx_ + pdx) < 0.01) & (jnp.abs(dy_ + pdy) < 0.01)
                     ).astype(jnp.float32)
            first = (it0 + j > 0).astype(jnp.float32)
            osc = osc_v * first
            not_cl = 1.0 - clamped
            back = active * osc * not_cl
            px = px - back * dx_ * 0.5
            py = py - back * dy_ * 0.5
            stop = jnp.maximum(small, osc) * not_cl
            done = jnp.maximum(done, jnp.maximum(stop, 1.0 - in_ok))
            pdx = active * dx_ + (1.0 - active) * pdx
            pdy = active * dy_ + (1.0 - active) * pdy

        pts_out[0, :] = px
        pts_out[1, :] = py
        done_out[0, :] = done
        pd_out[0, :] = pdx
        pd_out[1, :] = pdy

    return kernel


@partial(jax.jit, static_argnames=("win", "n_taps", "cubic", "eps",
                                   "Wd", "Hd", "interpret"))
def lk_block(dpatch, Ip, gxp, gyp, a11, a12, a22, inv_det, bx, by,
             trackable, pts, done, prev_delta, it0,
             *, win: int, n_taps: int, cubic: bool, eps: float,
             Wd: int, Hd: int, interpret: bool = False):
    """Run one BLOCK_ITERS LK update block on the lanes-last patch slab.

    Shapes: dpatch (P, P, N); Ip/gxp/gyp (win, win, N); per-point vectors
    (N,) f32 (masks as 0/1 f32); pts/prev_delta (2, N); it0 scalar int32.
    Returns (pts', done', prev_delta'). N must be a multiple of 128.
    """
    P = dpatch.shape[0]
    N = dpatch.shape[-1]
    # lane-block the grid so the win51 slab (64,64,N) stays within VMEM;
    # Mosaic double-buffers every input block across grid steps, so the
    # budget is ~2x the per-block footprint (256 lanes OOMed at 24.7 MB;
    # lane blocks must be 128-divisible)
    BN = 1024 if P <= 32 else 128
    BN = min(BN, N)
    assert N % BN == 0, (N, BN)
    kern = _make_kernel(win, n_taps, cubic, eps, Wd, Hd)

    def vec(i, m):
        return (0, i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((P, P, BN), lambda i, m: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, win, BN), lambda i, m: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, win, BN), lambda i, m: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, win, BN), lambda i, m: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, BN), vec, memory_space=pltpu.VMEM)] * 7 + [
            pl.BlockSpec((2, BN), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BN), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, BN), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BN), vec, memory_space=pltpu.VMEM),
        ),
    )
    f32 = jnp.float32

    def row(v):  # (N,) -> (1, N): Mosaic-friendly 2D operand
        return v.astype(f32).reshape(1, N)

    pts_o, done_o, pd_o = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((2, N), f32),
            jax.ShapeDtypeStruct((1, N), f32),
            jax.ShapeDtypeStruct((2, N), f32),
        ),
        interpret=interpret,
    )(
        jnp.asarray([it0], jnp.int32),
        dpatch.astype(f32), Ip.astype(f32), gxp.astype(f32), gyp.astype(f32),
        row(a11), row(a12), row(a22), row(inv_det), row(bx), row(by),
        row(trackable), pts.astype(f32), row(done), prev_delta.astype(f32),
    )
    return pts_o, done_o[0], pd_o
