"""Masked robust statistics.

Parity: ``sigma_rejection`` <-> reference ``fcnsigmarejection``
(/root/reference/utils/common.py:129-142): ``ni`` rounds of clipping to
mean +/- srl*std, expressed as masked reductions over static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def sigma_rejection(x, mask=None, srl: float = 3.0, iterations: int = 3):
    """Iterative sigma clipping; returns the surviving-element mask.

    std is population std (ddof=0) over currently-surviving elements, matching
    numpy defaults in the reference.
    """
    x = jnp.asarray(x)
    v = jnp.ones(x.shape, bool) if mask is None else mask
    for _ in range(iterations):
        m = v.astype(x.dtype)
        n = jnp.maximum(jnp.sum(m), 1.0)
        mu = jnp.sum(x * m) / n
        var = jnp.sum((x - mu) ** 2 * m) / n
        s = jnp.sqrt(var) * srl
        v = v & (x < mu + s) & (x > mu - s)
    return v
