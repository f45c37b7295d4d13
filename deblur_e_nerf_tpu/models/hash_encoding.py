"""Multi-resolution grid encodings (HashGrid / DenseGrid / TiledGrid).

TPU-native replacement for the reference's tiny-cuda-nn `tcnn.Encoding`
dependency (reference: deblur_e_nerf/external/ngp.py:166-187, config at
configs/train/synthetic.yaml:81-88). The forward pass is a per-level hashed
gather of 8 cell corners + trilinear interpolation; the backward pass is the
gather's transpose (scatter-add into the table), which XLA generates
automatically — no custom VJP is required for correctness, and a Pallas
kernel can later replace the gather/scatter pair behind the same function
signature.

Level geometry follows instant-NGP: resolution_l = floor(N_min * b^l), with
(res+1)^3 grid vertices per level; levels whose vertex count fits the table
are indexed densely, larger ones via the instant-NGP spatial hash
(pi1=1, pi2=2654435761, pi3=805459861, XOR-combined, masked to the
power-of-two table size).
"""

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_HASH_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(n_levels, base_resolution, per_level_scale):
    return [
        int(math.floor(base_resolution * per_level_scale ** level))
        for level in range(n_levels)
    ]


def grid_layout(otype, n_levels, base_resolution, per_level_scale,
                log2_hashmap_size):
    """Static per-level layout: (resolution, table_size, offset, mode).

    mode: 'dense' (full (res+1)^3 vertex table), 'hash', or 'tiled'.
    Returns (levels, total_table_size).
    """
    assert otype in ("HashGrid", "DenseGrid", "TiledGrid")
    hashmap_size = 1 << log2_hashmap_size
    levels = []
    offset = 0
    for res in level_resolutions(n_levels, base_resolution,
                                 per_level_scale):
        n_vertices = (res + 1) ** 3
        if otype == "DenseGrid" or n_vertices <= hashmap_size:
            mode, size = "dense", n_vertices
        elif otype == "HashGrid":
            mode, size = "hash", hashmap_size
        else:
            mode, size = "tiled", hashmap_size
        # align table segments to 128 lanes for clean TPU layouts
        size = -(-size // 128) * 128
        levels.append((res, size, offset, mode))
        offset += size
    return levels, offset


def _corner_indices(cell, res, size, mode):
    """Map integer corner coords (..., 3) int32 -> table row indices."""
    x = cell[..., 0].astype(jnp.uint32)
    y = cell[..., 1].astype(jnp.uint32)
    z = cell[..., 2].astype(jnp.uint32)
    if mode == "dense":
        stride = jnp.uint32(res + 1)
        idx = (z * stride + y) * stride + x
    else:
        if mode == "tiled":
            stride = jnp.uint32(res + 1)
            idx = (z * stride + y) * stride + x
        else:  # hash
            idx = (
                x * jnp.uint32(_HASH_PRIMES[0])
                ^ y * jnp.uint32(_HASH_PRIMES[1])
                ^ z * jnp.uint32(_HASH_PRIMES[2])
            )
        idx = idx % jnp.uint32(size)
    return idx.astype(jnp.int32)


# the 8 cell-corner offsets, shaped for broadcasting against (..., 1, 3)
_CORNER_OFFSETS = np.stack(
    np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), axis=-1
).reshape(8, 3).astype(np.int32)


def encode(table, u, levels):
    """Multi-resolution grid encode.

    Args:
        table: (total_table_size, F) feature table parameter.
        u: (..., 3) positions in the contracted unit cube [0, 1]^3
           (out-of-range positions clamp; the field's selector mask handles
           validity).
        levels: static layout from `grid_layout`.
    Returns:
        (..., n_levels * F) features, dtype of `table`.
    """
    features = []
    corner_offsets = jnp.asarray(_CORNER_OFFSETS)
    uc = jnp.clip(u, 0.0, 1.0)
    for res, size, offset, mode in levels:
        scaled = uc * jnp.asarray(res, dtype=u.dtype)
        cell = jnp.floor(scaled)
        frac = (scaled - cell).astype(table.dtype)
        cell = cell.astype(jnp.int32)
        corners = cell[..., None, :] + corner_offsets  # (..., 8, 3)
        corners = jnp.clip(corners, 0, res)
        idx = offset + _corner_indices(corners, res, size, mode)
        gathered = jnp.take(table, idx, axis=0)  # (..., 8, F)
        # trilinear weights: prod over dims of (1-frac) or frac per corner
        w = jnp.where(
            corner_offsets.astype(bool), frac[..., None, :],
            1.0 - frac[..., None, :],
        )
        w = jnp.prod(w, axis=-1)  # (..., 8)
        features.append(jnp.sum(gathered * w[..., None], axis=-2))
    return jnp.concatenate(features, axis=-1)
