"""Feature-axis sharded tracking — the tensor-parallel analog (SURVEY §2.4).

The classic-TP analog in this framework is sharding the FEATURE axis of the
batched LK solve: every point's window solve is independent given the frame
pyramids, so the (static-capacity) track axis partitions across the mesh
while the pyramids replicate. Each device tracks its lane shard with the
unchanged lanes-last engine (Pallas kernels and all); there is NO
communication inside LK — the only global steps in the tracker (RANSAC
affine, survivor counts) consume the all-gathered point results, exactly
like TP's row/column-parallel matmuls hand off at layer boundaries.

With images replicated this is compute parallelism over lanes; its use case
is high track capacity (N >> 1024) or splitting the fb legs' work across
chips in a window group.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from velocity_tpu.ops.lk_lanes import lk_forward_backward_lanes, LKResult


def lk_forward_backward_sharded(
    src_img,
    dst_img,
    pts_src,  # (N, 2); N divisible by the mesh axis size
    mesh: Mesh,
    axis: str = "feature",
    *,
    fb_threshold=None,
    guess=None,
    warp_dst=None,
    **kw,
) -> LKResult:
    """Forward-backward lanes LK with the point axis sharded over ``mesh``.

    Results are bit-identical to the single-device call (per-point math is
    embarrassingly parallel; pyramids are built redundantly per device,
    which is the right trade at these image sizes — broadcasting levels
    would cost more ICI than the rebuild costs FLOPs).
    """
    N = pts_src.shape[0]
    n_shard = mesh.shape[axis]
    if N % n_shard != 0:
        raise ValueError(f"track capacity {N} not divisible by {n_shard}")

    in_specs = (P(), P(), P(axis, None))
    gspec = P(axis, None) if guess is not None else None

    def shard_fn(src, dst, pts, *opt):
        g = opt[0] if guess is not None else None
        r = lk_forward_backward_lanes(
            src, dst, pts, fb_threshold=fb_threshold, guess=g,
            warp_dst=warp_dst, **kw,
        )
        return r.points, r.status

    specs = list(in_specs) + ([gspec] if guess is not None else [])
    fn = shard_map(
        shard_fn, mesh=mesh, in_specs=tuple(specs),
        out_specs=(P(axis, None), P(axis)), check_vma=False,
    )
    args = (src_img, dst_img, pts_src) + ((guess,) if guess is not None else ())
    pts, status = fn(*args)
    return LKResult(points=pts, status=status)
