"""Generic Levenberg-Marquardt engine as a jittable ``lax.while_loop``.

Replicates the reference's LM structure (/root/reference/utils/NLS.py:102-183):
identity Marquardt damping, iteration-ramped step scale
``min(((i+1)*ramp_rate)^2, 1)``, convergence on ``rms(delta) < tol``, fixed
iteration cap — but with *analytic* Jacobians (jax.jacfwd) instead of the
reference's forward differences (dx=1e-6), which are numerically unusable in
f32 and strictly less accurate in f64.

Masking contract: ``residual_fn(x)`` returns the full static-shape residual
vector with invalid measurements already zeroed (multiply by the mask *inside*
the function so Jacobian rows of masked measurements vanish identically —
zeroing the residual alone would still pollute J^T J).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32 number of iterations executed
    delta_rms: jnp.ndarray  # rms of last step
    residual_rms: jnp.ndarray  # masked rms of residual at solution


def lm_solve(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    *,
    max_iters: int = 30,
    damping: float = 1.0,
    tol: float = 1e-8,
    ramp_rate: float = 0.2,
    use_ramp: bool = True,
    step_scale: float = 1.0,
    num_residuals: Callable[[], jnp.ndarray] | float | None = None,
) -> LMResult:
    """Minimize ||residual_fn(x)||^2 with damped Gauss-Newton steps.

    ``residual_fn``: x -> r where r = z - zhat (masked entries zero).
    ``num_residuals``: count of *valid* residual entries for the reported rms
    (defaults to r.size, correct when nothing is masked).
    """
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    nx = x0.shape[0]
    eye = jnp.eye(nx, dtype=dtype) * jnp.asarray(damping, dtype)
    big = jnp.asarray(jnp.inf, dtype)
    # dtype-aware convergence floor: the reference's 1e-8 is unreachable in
    # f32 (steps stagnate at rounding noise ~50 eps); stop there instead of
    # burning the full iteration budget.
    tol = max(tol, 50.0 * float(jnp.finfo(dtype).eps))

    def rms_of(v, n):
        return jnp.sqrt(jnp.sum(v * v) / n)

    def nvalid():
        if num_residuals is None:
            return None
        if callable(num_residuals):
            return num_residuals()
        return jnp.asarray(num_residuals, dtype)

    def step(carry):
        x, i, _ = carry
        r, J = residual_fn(x), jax.jacfwd(residual_fn)(x)
        # r = z - zhat, J = dr/dx = -dzhat/dx; the reference's
        # delta = inv(JzT Jz + damping I) JzT (z - zhat) * scale equals:
        g = -(J.T @ r)
        H = J.T @ J + eye
        scale = jnp.asarray(step_scale, dtype)
        if use_ramp:
            ramp = jnp.minimum(((i + 1.0) * ramp_rate) ** 2, 1.0).astype(dtype)
            scale = scale * ramp
        delta = jnp.linalg.solve(H, g) * scale
        n = jnp.asarray(delta.size, dtype)
        return x + delta, i + 1, rms_of(delta, n)

    def cond(carry):
        _, i, delta_rms = carry
        return (i < max_iters) & (delta_rms >= tol)

    x, iters, delta_rms = jax.lax.while_loop(cond, step, (x0, jnp.int32(0), big))
    r = residual_fn(x)
    n = nvalid()
    n = jnp.asarray(r.size, dtype) if n is None else jnp.maximum(n, 1.0)
    return LMResult(x=x, iterations=iters, delta_rms=delta_rms, residual_rms=rms_of(r, n))
