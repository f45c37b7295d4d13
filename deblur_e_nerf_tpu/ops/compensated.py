"""Compensated (double-float32) summation primitives.

TPU linear algebra is float32-only and this backend's emulated float64
faults beyond ~1M elements, so long prefix sums are carried as (hi, lo)
error-free-transform pairs instead: f32 cumsums within fixed blocks
(values stay block-scale) plus a compensated scan over the block totals.
Shared by the renderer's per-ray optical-depth prefix sums
(models/renderer.py) and the hash-encoding sort backward's segment sums
(models/hash_encoding.py; ADVICE r4: the plain global f32 cumsum loses
~eps * |prefix| per row, which at 16M+ contributions dwarfs small
segment sums).
"""

import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Error-free transform: a + b = s + err exactly (Knuth TwoSum)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Error-free a + b = s + err, requiring |a| >= |b| (Dekker)."""
    s = a + b
    return s, b - (s - a)


DEFAULT_BLOCK = 1 << 15


def blocked_cumsum(x, block=DEFAULT_BLOCK):
    """Blocked inclusive cumsum with compensated block bases.

    Args:
        x: (N,) or (N, C) float32 values (cumsum along axis 0; channels
           vectorize).
        block: static block length B.
    Returns:
        (within, base_hi, base_lo):
          within  like x — INCLUSIVE cumsum within each B-block,
          base_hi (nb[, C]) f32 — exclusive block base, hi component,
          base_lo (nb[, C]) f32 — exclusive block base, lo component,
        so cumsum(x)[i] ~= within[i] + base_hi[i // B] + base_lo[i // B]
        with the base carried to ~double-f32 accuracy.
    """
    n = x.shape[0]
    tail = x.shape[1:]
    n_pad = -(-n // block) * block
    blocks = jnp.concatenate(
        [x, jnp.zeros((n_pad - n,) + tail, x.dtype)]
    ).reshape((-1, block) + tail)
    within = jnp.cumsum(blocks, axis=1)
    totals = within[:, -1]  # (nb[, C])

    def body(carry, t):
        hi, lo = carry
        s, e = two_sum(hi, t)
        lo2 = lo + e
        hi2, lo3 = fast_two_sum(s, lo2)
        return (hi2, lo3), (hi, lo)  # exclusive outputs

    zero = jnp.zeros(tail, x.dtype)
    _, (base_hi, base_lo) = jax.lax.scan(body, (zero, zero), totals)
    return within.reshape((-1,) + tail)[:n], base_hi, base_lo
