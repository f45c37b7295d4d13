"""Unbounded-scene space contractions and their inverses.

Forward contractions map world space into the unit cube [0, 1]^3, matching
the reference semantics (reference: deblur_e_nerf/external/ngp.py:68-106):
  - AABB: plain normalization (points outside fall outside [0, 1]).
  - SPHERE: mip-NeRF-360 style: identity inside the unit ball of the
    normalized AABB, radially contracted to |x| < 2 outside, then mapped to
    [0, 1] via x/4 + 0.5.
  - TANH: elementwise tanh around the AABB center.

Inverses are needed on TPU because the occupancy grid lives in contracted
space and grid-cell sample positions must be mapped back to world space for
density evaluation (the reference does this inside nerfacc's CUDA
`OccupancyGrid`; here it is plain vectorized math).
"""

import enum

import jax.numpy as jnp


class ContractionType(enum.Enum):
    AABB = "aabb"
    UN_BOUNDED_SPHERE = "sphere"
    UN_BOUNDED_TANH = "tanh"


def contract(x, aabb, contraction_type, eps=1e-6):
    """World position -> contracted [0, 1]^3 coordinate."""
    num_dim = x.shape[-1]
    aabb_min, aabb_max = aabb[..., :num_dim], aabb[..., num_dim:]
    u = (x - aabb_min) / (aabb_max - aabb_min)
    if contraction_type == ContractionType.AABB:
        return u
    if contraction_type == ContractionType.UN_BOUNDED_SPHERE:
        v = u * 2 - 1  # aabb at [-1, 1]
        mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
        safe_mag = jnp.maximum(mag, eps)
        v = jnp.where(mag > 1, (2 - 1 / safe_mag) * (v / safe_mag), v)
        return v / 4 + 0.5
    if contraction_type == ContractionType.UN_BOUNDED_TANH:
        v = u - 0.5  # aabb at [-0.5, 0.5]
        return (jnp.tanh(v) + 1) / 2
    raise NotImplementedError(contraction_type)


def contract_inv(u, aabb, contraction_type, eps=1e-6):
    """Contracted [0, 1]^3 coordinate -> world position."""
    num_dim = u.shape[-1]
    aabb_min, aabb_max = aabb[..., :num_dim], aabb[..., num_dim:]
    extent = aabb_max - aabb_min
    if contraction_type == ContractionType.AABB:
        return aabb_min + u * extent
    if contraction_type == ContractionType.UN_BOUNDED_SPHERE:
        w = (u - 0.5) * 4  # |w| < 2
        mag = jnp.linalg.norm(w, axis=-1, keepdims=True)
        mag = jnp.minimum(mag, 2 - eps)
        safe_mag = jnp.maximum(mag, eps)
        # inverse of v -> (2 - 1/|v|) v/|v| for |v| > 1: |v| = 1/(2 - mag)
        v = jnp.where(mag > 1, w / safe_mag / (2 - mag), w)
        return aabb_min + (v + 1) / 2 * extent
    if contraction_type == ContractionType.UN_BOUNDED_TANH:
        t = jnp.clip(u * 2 - 1, -1 + eps, 1 - eps)
        v = jnp.arctanh(t) + 0.5
        return aabb_min + v * extent
    raise NotImplementedError(contraction_type)
