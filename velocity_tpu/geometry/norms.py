"""Small vector helpers shared across the geometry/solver stack.

Parity notes: semantics match the reference helpers ``norm``/``rms``/``uvec``/
``addcol0``/``addcol1`` (/root/reference/utils/common.py:13-39) but are implemented
as dtype-polymorphic jnp ops that broadcast over arbitrary leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def norm(x, axis=None):
    """L2 norm of ``x`` over ``axis`` (all elements when ``axis`` is None)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis))


def rms(x, axis=None):
    """Root-mean-square of ``x`` over ``axis`` (all elements when ``axis`` is None)."""
    return jnp.sqrt(jnp.mean(x * x, axis=axis))


def masked_rms(x, mask, axis=None, eps=0.0):
    """RMS over entries where ``mask`` is True; masked-out entries contribute nothing."""
    m = mask.astype(x.dtype)
    num = jnp.sum(x * x * m, axis=axis)
    den = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return jnp.sqrt(num / den + eps)


def unit_rows(x, axis=-1, eps=0.0):
    """Normalize vectors along ``axis`` to unit length (default: last axis / rows)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
    return x / n


def append_col(x, value):
    """Append a constant column ``value`` to the right of a (..., N, D) array."""
    pad = jnp.full(x.shape[:-1] + (1,), value, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=-1)
