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
                      is_efficient=False, matrix_leading_out=False):
    """First-Order-Hold discretization of a batched continuous LTI system.

    Args:
        system: StateSpace in standard continuous form, batch dims leading.
        dt: discretization steps, shape broadcastable to the batch dims.
        is_state_preserved: if True, the discrete state equals the continuous
            state (non-standard form with B_tilde); else scipy's standard FOH.
        is_efficient: use expm(A dt) + linear solves (requires invertible A)
            instead of the (n+2m)x(n+2m) embedding exponential.
        matrix_leading_out: return A/B/B_tilde in MATRIX-LEADING layout
            (n, n|m, batch...) instead of trailing. Trailing (batch, n, n)
            arrays tile-pad ~32-64x on TPU ((4,4) minor dims vs (8,128)
            tiles) — consumers that stay matrix-leading (the
            pixel-bandwidth weight scan) avoid materializing them.
            Only supported with is_state_preserved.
    Returns:
        StateSpace of the discretized system (non-standard form when
        is_state_preserved).
    """
    a, b, c, d = system.A, system.B, system.C, system.D
    n = a.shape[-1]
    m = b.shape[-1]

    # all small-matrix math runs in matrix-leading layout (n, n, batch...)
    # so batch dims land on the (8, 128) hardware tiles with zero padding
    # (see ops/linalg.py); convert at the boundary only.
    a_ml = jnp.moveaxis(a, (-2, -1), (0, 1))
    b_ml = jnp.moveaxis(jnp.broadcast_to(
        b, (*a.shape[:-2], n, m)
    ), (-2, -1), (0, 1))
    batch_ndim = a_ml.ndim - 2
    dt_ml = jnp.asarray(dt, dtype=a.dtype)[None, None]

    if is_efficient:
        a_dt = a_ml * dt_ml
        phi_ml = linalg.expm_ml(a_dt)
        a_inv_b = linalg.solve_ml(a_ml, b_ml)
        eye = linalg.eye_ml(n, batch_ndim, a.dtype)
        gamma1_ml = linalg.matmul_ml(phi_ml - eye, a_inv_b)
        gamma2_ml = linalg.solve_ml(a_dt, gamma1_ml) - a_inv_b
    else:
        batch_shape = jnp.broadcast_shapes(
            a.shape[:-2], jnp.shape(dt)
        )
        n2 = n + 2 * m
        em = jnp.zeros((n2, n2, *batch_shape), dtype=a.dtype)
        em = em.at[:n, :n].set(
            jnp.broadcast_to(a_ml * dt_ml, (n, n, *batch_shape))
        )
        em = em.at[:n, n:n + m].set(
            jnp.broadcast_to(b_ml * dt_ml, (n, m, *batch_shape))
        )
        em = em.at[n:n + m, n + m:].set(
            linalg.eye_ml(m, len(batch_shape), a.dtype)
        )
        ms = linalg.expm_ml(em)
        phi_ml = ms[:n, :n]
        gamma1_ml = ms[:n, n:n + m]
        gamma2_ml = ms[:n, n + m:]

    if matrix_leading_out:
        assert is_state_preserved
        return StateSpace(
            A=phi_ml, B=gamma1_ml - gamma2_ml, C=c, D=d,
            B_tilde=gamma2_ml,
        )

    phi = jnp.moveaxis(phi_ml, (0, 1), (-2, -1))
    gamma1 = jnp.moveaxis(gamma1_ml, (0, 1), (-2, -1))
    gamma2 = jnp.moveaxis(gamma2_ml, (0, 1), (-2, -1))

    if is_state_preserved:
        return StateSpace(
            A=phi, B=gamma1 - gamma2, C=c, D=d, B_tilde=gamma2
        )
    return StateSpace(
        A=phi, B=gamma1 - gamma2 + phi @ gamma2, C=c, D=d + c @ gamma2,
        B_tilde=None,
    )
