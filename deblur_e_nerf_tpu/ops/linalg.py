"""Batched small-matrix linear algebra in matrix-leading layout.

The pixel-bandwidth model batches hundreds of thousands of 4x4 state-space
matrices. In the conventional (..., n, n) layout, the TPU pads the minor
(n, n) = (4, 4) dims to an (8, 128) tile — a 32x memory expansion that
turns 350MB of expm residuals into 11GB of HBM. All math here therefore
uses a **matrix-leading** layout (n, n, batch...): the tiny static matrix
dims are major axes (unrolled Python loops / einsum contractions) and the
large batch dims land on the hardware tiles with zero padding. On the VPU
a 4x4 matmul is 64 fused multiply-adds over (batch,) vectors.

Provides:
  - matmul_ml / solve_ml (unrolled partial-pivot Gaussian elimination)
  - expm_ml: float32-safe Pade-13 scaling-and-squaring with per-element
    scaling applied BEFORE any matrix powers (`jax.scipy.linalg.expm`
    overflows in f32 on the stiff pixel-circuit systems, and f64 linalg is
    unsupported on TPU)
  - expm: (..., n, n) wrapper around expm_ml for API compatibility
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
MAX_SQUARINGS = 32  # covers ||A|| up to theta13 * 2^32 ~ 2.3e10


def eye_ml(n, batch_ndim, dtype=jnp.float32):
    """Identity in matrix-leading layout, broadcastable over the batch."""
    return jnp.eye(n, dtype=dtype).reshape(n, n, *([1] * batch_ndim))


def matmul_ml(a, b):
    """(i, j, ...) @ (j, k, ...) -> (i, k, ...).

    precision=HIGHEST: TPU default dot precision multiplies f32 operands
    in bfloat16 passes; Pade-13's large coefficients (b0 ~ 6.5e16) make
    the v - u cancellation in expm_ml sensitive enough that bf16-rounded
    products can render the solve singular (the TPU-only non-finite at
    toy calibrations, ROADMAP round-4). Full f32 is free here: the
    contraction is 4-wide over batch-leading vectors (VPU FMAs).
    """
    return jnp.einsum("ij...,jk...->ik...", a, b,
                      precision=jax.lax.Precision.HIGHEST)


def solve_ml(a, b):
    """Solve a @ x = b with a (n, n, ...), b (n, m, ...) -> x (n, m, ...).

    Unrolled Gaussian elimination with partial pivoting; all arithmetic is
    elementwise over the batch dims (n, m are small and static).
    """
    n = a.shape[0]
    m = b.shape[1]
    # rows[i] : (n + m, ...) augmented row
    rows = [
        jnp.concatenate([a[i], b[i]], axis=0) for i in range(n)
    ]
    for col in range(n):
        # partial pivot among rows col..n-1 (unrolled select)
        mags = jnp.stack(
            [jnp.abs(rows[r][col]) for r in range(col, n)]
        )  # (n-col, ...)
        piv = jnp.argmax(mags, axis=0)  # (...,)
        pivot_row = rows[col]
        for off in range(1, n - col):
            pivot_row = jnp.where(
                piv[None] == off, rows[col + off], pivot_row
            )
        new_rows = list(rows)
        new_rows[col] = pivot_row
        for off in range(1, n - col):
            new_rows[col + off] = jnp.where(
                piv[None] == off, rows[col], rows[col + off]
            )
        rows = new_rows
        # eliminate below the pivot
        inv_p = 1.0 / rows[col][col]  # (...,)
        for r in range(col + 1, n):
            factor = (rows[r][col] * inv_p)[None]
            rows[r] = rows[r] - factor * rows[col]
    # back substitution
    x = [None] * n
    for i in reversed(range(n)):
        acc = rows[i][n:]  # (m, ...)
        for j in range(i + 1, n):
            acc = acc - rows[i][j][None] * x[j]
        x[i] = acc / rows[i][i][None]
    return jnp.stack(x)  # (n, m, ...)


def expm_ml(a, max_squarings=MAX_SQUARINGS):
    """Matrix exponential of (n, n, batch...) in matrix-leading layout."""
    dtype = a.dtype
    n = a.shape[0]
    batch_ndim = a.ndim - 2
    eye = eye_ml(n, batch_ndim, dtype)

    # per-element 1-norm (max abs column sum): sum rows, max cols
    norm = jnp.max(jnp.sum(jnp.abs(a), axis=0), axis=0)  # (...)
    norm = jnp.maximum(norm, jnp.finfo(dtype).tiny)
    s = jnp.ceil(jnp.log2(norm / _THETA13))
    s = jnp.clip(s, 0, max_squarings).astype(jnp.int32)
    s = jax.lax.stop_gradient(s)
    a = a * jnp.exp2(-s.astype(dtype))[None, None]

    b = _PADE13_B
    a2 = matmul_ml(a, a)
    a4 = matmul_ml(a2, a2)
    a6 = matmul_ml(a2, a4)
    u = matmul_ml(a, (
        matmul_ml(a6, b[13] * a6 + b[11] * a4 + b[9] * a2)
        + b[7] * a6 + b[5] * a4 + b[3] * a2 + b[1] * eye
    ))
    v = (
        matmul_ml(a6, b[12] * a6 + b[10] * a4 + b[8] * a2)
        + b[6] * a6 + b[4] * a4 + b[2] * a2 + b[0] * eye
    )
    phi = solve_ml(v - u, v + u)

    def body(i, phi):
        do_square = (i < s)[None, None]
        return jnp.where(do_square, matmul_ml(phi, phi), phi)

    return jax.lax.fori_loop(0, max_squarings, body, phi)


def expm(a, max_squarings=MAX_SQUARINGS):
    """Matrix exponential of (..., n, n); thin wrapper over expm_ml."""
    a_ml = jnp.moveaxis(a, (-2, -1), (0, 1))
    out = expm_ml(a_ml, max_squarings)
    return jnp.moveaxis(out, (0, 1), (-2, -1))
