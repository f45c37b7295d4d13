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

    def combine(a, b):
        # double-f32 addition (two-sum + renormalize): associative up
        # to O(eps^2) terms — a log-depth TREE scan instead of a
        # serial lax.scan, so no while loop enters the compiled program
        # (the round-5 backward emits one of these per level; dozens of
        # tiny whiles ballooned the remote TPU compile)
        s, e = two_sum(a[0], b[0])
        return fast_two_sum(s, a[1] + b[1] + e)

    zeros = jnp.zeros_like(totals)
    inc_hi, inc_lo = jax.lax.associative_scan(
        combine, (totals, zeros), axis=0
    )
    # exclusive bases: shift the inclusive pair down by one block
    base_hi = jnp.concatenate([zeros[:1], inc_hi[:-1]], axis=0)
    base_lo = jnp.concatenate([zeros[:1], inc_lo[:-1]], axis=0)
    return within.reshape((-1,) + tail)[:n], base_hi, base_lo
