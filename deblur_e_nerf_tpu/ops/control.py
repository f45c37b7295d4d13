"""Batched LTI state-space models and First-Order-Hold discretization.

Functional JAX analog of the reference's control toolbox
(reference: deblur_e_nerf/utils/control.py:6-123), which itself follows
scipy.signal.cont2discrete(method='foh'); everything here is differentiable
and jit/vmap-friendly with static shapes:

  Continuous standard form:   x'(t) = A x(t) + B u(t);  y = C x + D u
  Discrete non-standard form: x[k+1] = A[k] x[k] + B[k] u[k] + Bt[k] u[k+1]
                              y[k]   = C x[k] + D u[k]

On TPU the (..., 4, 4) matrix exponential batches map onto the MXU via the
Pade scaling-and-squaring in jax.scipy.linalg.expm.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import linalg


class StateSpace(NamedTuple):
    A: jnp.ndarray  # (..., n, n)
    B: jnp.ndarray  # (..., n, m)
    C: jnp.ndarray  # (..., o, n)
    D: jnp.ndarray  # (..., o, m)
    B_tilde: Optional[jnp.ndarray] = None  # (..., n, m) non-standard form


def foh_cont2discrete(system, dt, is_state_preserved=False,
                      is_efficient=False):
    """First-Order-Hold discretization of a batched continuous LTI system.

    Args:
        system: StateSpace in standard continuous form, batch dims leading.
        dt: discretization steps, shape broadcastable to the batch dims.
        is_state_preserved: if True, the discrete state equals the continuous
            state (non-standard form with B_tilde); else scipy's standard FOH.
        is_efficient: use expm(A dt) + linear solves (requires invertible A)
            instead of the (n+2m)x(n+2m) embedding exponential.
    Returns:
        StateSpace of the discretized system (non-standard form when
        is_state_preserved).
    """
    a, b, c, d = system.A, system.B, system.C, system.D
    n = a.shape[-1]
    m = b.shape[-1]
    dt = jnp.asarray(dt, dtype=a.dtype)[..., None, None]

    if is_efficient:
        a_dt = a * dt
        phi = linalg.expm(a_dt)
        a_inv_b = jnp.linalg.solve(a, b)
        eye = jnp.eye(n, dtype=a.dtype)
        gamma1 = (phi - eye) @ a_inv_b
        gamma2 = jnp.linalg.solve(a_dt, gamma1) - a_inv_b
    else:
        batch_shape = jnp.broadcast_shapes(
            a.shape[:-2], dt.shape[:-2]
        )
        em = jnp.zeros((*batch_shape, n + 2 * m, n + 2 * m), dtype=a.dtype)
        em = em.at[..., :n, :n].set(a * dt)
        em = em.at[..., :n, n:n + m].set(b * dt)
        em = em.at[..., n:n + m, n + m:].set(
            jnp.eye(m, dtype=a.dtype)
        )
        ms = linalg.expm(em)
        phi = ms[..., :n, :n]
        gamma1 = ms[..., :n, n:n + m]
        gamma2 = ms[..., :n, n + m:]

    if is_state_preserved:
        return StateSpace(
            A=phi, B=gamma1 - gamma2, C=c, D=d, B_tilde=gamma2
        )
    return StateSpace(
        A=phi, B=gamma1 - gamma2 + phi @ gamma2, C=c, D=d + c @ gamma2,
        B_tilde=None,
    )
