"""Batched float32-safe matrix exponential.

`jax.scipy.linalg.expm` overflows in float32 on the stiff pixel-circuit
systems this framework linearizes (|A dt| up to ~1e7; high matrix powers
exceed the f32 range before scaling), and float64 linalg is unsupported on
TPU. This implements the classic scaling-and-squaring Pade-13 approximant
with *per-batch-element* scaling applied BEFORE any matrix powers, so all
intermediates stay bounded: ||A/2^s|| <= theta13. The squaring loop runs a
fixed MAX_SQUARINGS trip count with per-element predication
(`where(i < s, phi @ phi, phi)`) — static shapes, jit/vmap/grad-friendly,
and 4x4 batched matmuls map cleanly onto the TPU.
"""

import jax
import jax.numpy as jnp

_PADE13_B = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0,
    670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
    960960.0, 16380.0, 182.0, 1.0,
)
_THETA13 = 5.371920351148152
MAX_SQUARINGS = 48  # covers ||A|| up to theta13 * 2^48


def expm(a, max_squarings=MAX_SQUARINGS):
    """Matrix exponential of (..., n, n) with per-element scaling."""
    dtype = a.dtype
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=dtype)

    # per-element 1-norm (max abs column sum)
    norm = jnp.max(jnp.sum(jnp.abs(a), axis=-2), axis=-1)  # (...)
    norm = jnp.maximum(norm, jnp.finfo(dtype).tiny)
    s = jnp.ceil(jnp.log2(norm / _THETA13))
    s = jnp.clip(s, 0, max_squarings).astype(jnp.int32)
    s = jax.lax.stop_gradient(s)
    scale = jnp.exp2(-s.astype(dtype))[..., None, None]
    a = a * scale

    b = _PADE13_B
    a2 = a @ a
    a4 = a2 @ a2
    a6 = a2 @ a4
    u = a @ (
        a6 @ (b[13] * a6 + b[11] * a4 + b[9] * a2)
        + b[7] * a6 + b[5] * a4 + b[3] * a2 + b[1] * eye
    )
    v = (
        a6 @ (b[12] * a6 + b[10] * a4 + b[8] * a2)
        + b[6] * a6 + b[4] * a4 + b[2] * a2 + b[0] * eye
    )
    phi = jnp.linalg.solve(v - u, v + u)

    def body(i, phi):
        do_square = (i < s)[..., None, None]
        return jnp.where(do_square, phi @ phi, phi)

    return jax.lax.fori_loop(0, max_squarings, body, phi)
