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

import functools
import os
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HASH_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(n_levels, base_resolution, per_level_scale):
    return [
        int(math.floor(base_resolution * per_level_scale ** level))
        for level in range(n_levels)
    ]


def grid_layout(otype, n_levels, base_resolution, per_level_scale,
                log2_hashmap_size, cellhash_min_load=None):
    """Static per-level layout: (resolution, table_size, offset, mode).

    mode: 'dense' (full (res+1)^3 vertex table), 'hash', 'tiled', or
    'cellhash'. Returns (levels, total_table_size).

    'CellHashGrid' is a TPU-fast variant of 'HashGrid' (same parameter
    count): over-capacity levels hash the CELL and store its 8 corner
    features contiguously in one (8*F)-float row, so the forward is ONE
    row gather per sample per level instead of 8 (row gathers cost ~the
    same for 2 or 16 floats on TPU). The trade: corner features are
    cell-local — neighboring cells no longer share vertex entries, so
    the encoding is only C0 WITHIN cells at those levels (instant-NGP's
    hash collisions already break clean sharing there; the MLP smooths).
    Dense (within-capacity) levels are identical to 'HashGrid'.

    'HybridHashGrid' keeps instant-NGP vertex hashing on the
    moderately-over-capacity levels (where vertex sharing still carries
    real signal — the measured ~1.7 dB CellHashGrid quality gap lives
    there) and switches to the cell-row layout only on levels whose
    vertex count exceeds `cellhash_min_load` x table size (default 8):
    at >= 8 expected collisions per entry the vertex identity is
    already destroyed, so the cell-local layout costs nothing and the
    fine levels — the majority of the encode's gather/scatter traffic —
    run at CellHash speed.
    """
    assert otype in ("HashGrid", "DenseGrid", "TiledGrid",
                     "CellHashGrid", "HybridHashGrid")
    hashmap_size = 1 << log2_hashmap_size
    min_load = 8.0 if cellhash_min_load is None else \
        float(cellhash_min_load)
    levels = []
    offset = 0
    for res in level_resolutions(n_levels, base_resolution,
                                 per_level_scale):
        n_vertices = (res + 1) ** 3
        if otype == "DenseGrid" or n_vertices <= hashmap_size:
            mode, size = "dense", n_vertices
        elif otype == "HashGrid":
            mode, size = "hash", hashmap_size
        elif otype == "CellHashGrid":
            mode, size = "cellhash", hashmap_size
        elif otype == "HybridHashGrid":
            mode = ("cellhash"
                    if n_vertices >= min_load * hashmap_size else "hash")
            size = hashmap_size
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


# the 8 cell-corner offsets, shaped for broadcasting against (..., 1, 3);
# row k adds (dx, dy, dz) = _CORNER_OFFSETS[k] to the cell's (x, y, z)
_CORNER_OFFSETS = np.stack(
    np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), axis=-1
).reshape(8, 3).astype(np.int32)


def _pack_dense_segment(segment, res):
    """Vertex table segment ((res+1)^3, F) -> cell-corner table
    (res^3, 8*F) by pure shifted slicing (no index ops).

    TPU rationale: a row gather costs ~the same for 2 or 16 floats/row
    (measured ~11 vs ~13 ns), so fetching a cell's 8 corner features as
    ONE 8F-float row is ~6x cheaper than 8 vertex-row gathers. The packed
    table is a derived VIEW built per call — parameters stay in the
    shared-vertex layout (checkpoint compatible, exact instant-NGP
    semantics), and gradients fold back through the slicing transpose.
    """
    F = segment.shape[-1]
    g = segment.reshape(res + 1, res + 1, res + 1, F)  # (z, y, x, F)
    parts = [
        g[dz:dz + res, dy:dy + res, dx:dx + res]
        for dx, dy, dz in _CORNER_OFFSETS
    ]
    packed = jnp.stack(parts, axis=-2)  # (res, res, res, 8, F)
    return packed.reshape(res ** 3, 8 * F)


def _fold_dense_segment_grad(packed_grad, res, F, dtype):
    """Transpose of `_pack_dense_segment`: (res^3, 8F) cell-corner grads
    -> ((res+1)^3, F) vertex grads via shifted slice-adds (vector only)."""
    pg = packed_grad.reshape(res, res, res, 8, F)
    vg = jnp.zeros((res + 1, res + 1, res + 1, F), dtype)
    for k, (dx, dy, dz) in enumerate(_CORNER_OFFSETS):
        vg = vg.at[dz:dz + res, dy:dy + res, dx:dx + res].add(
            pg[..., k, :]
        )
    return vg.reshape((res + 1) ** 3, F)


def _cellhash_index_weights(uc, res, size, dtype):
    """(hashed cell-row index (...,), trilinear weights (..., 8)) for a
    cellhash level: one row of the (size//8, 8F)-viewed segment per cell
    (instant-NGP spatial hash of the CELL coordinates)."""
    corner_offsets = jnp.asarray(_CORNER_OFFSETS)
    scaled = uc * jnp.asarray(res, dtype=uc.dtype)
    cell = jnp.clip(jnp.floor(scaled), 0, res - 1)
    frac = (scaled - cell).astype(dtype)
    cell = cell.astype(jnp.uint32)
    h = (
        cell[..., 0] * jnp.uint32(_HASH_PRIMES[0])
        ^ cell[..., 1] * jnp.uint32(_HASH_PRIMES[1])
        ^ cell[..., 2] * jnp.uint32(_HASH_PRIMES[2])
    ) % jnp.uint32(size // 8)
    w = jnp.where(
        corner_offsets.astype(bool), frac[..., None, :],
        1.0 - frac[..., None, :],
    )
    return h.astype(jnp.int32), jnp.prod(w, axis=-1)


def _dense_cell_index_weights(uc, res, dtype):
    """(flat cell index (...,), trilinear weights (..., 8)) for a packed
    dense level. Matches `_level_indices_weights` semantics including the
    u == 1.0 boundary (frac hits 1.0 on the clipped last cell, selecting
    the same far-corner vertices the clipped-corner path selects)."""
    corner_offsets = jnp.asarray(_CORNER_OFFSETS)
    scaled = uc * jnp.asarray(res, dtype=uc.dtype)
    cell = jnp.clip(jnp.floor(scaled), 0, res - 1)
    frac = (scaled - cell).astype(dtype)
    cell = cell.astype(jnp.int32)
    flat = (cell[..., 2] * res + cell[..., 1]) * res + cell[..., 0]
    w = jnp.where(
        corner_offsets.astype(bool), frac[..., None, :],
        1.0 - frac[..., None, :],
    )
    return flat, jnp.prod(w, axis=-1)


def _level_indices_weights(uc, res, size, offset, mode, dtype):
    """(corner indices (..., 8), trilinear weights (..., 8)) for a level."""
    corner_offsets = jnp.asarray(_CORNER_OFFSETS)
    scaled = uc * jnp.asarray(res, dtype=uc.dtype)
    cell = jnp.floor(scaled)
    frac = (scaled - cell).astype(dtype)
    cell = cell.astype(jnp.int32)
    corners = cell[..., None, :] + corner_offsets  # (..., 8, 3)
    corners = jnp.clip(corners, 0, res)
    idx = offset + _corner_indices(corners, res, size, mode)
    # trilinear weights: prod over dims of (1-frac) or frac per corner
    w = jnp.where(
        corner_offsets.astype(bool), frac[..., None, :],
        1.0 - frac[..., None, :],
    )
    return idx, jnp.prod(w, axis=-1)


def _encode_impl(table, u, levels):
    features = []
    uc = jnp.clip(u, 0.0, 1.0)
    F = table.shape[-1]
    for res, size, offset, mode in levels:
        if mode == "dense":
            # one 8F-float row gather per sample from the derived
            # cell-corner table (see _pack_dense_segment)
            packed = _pack_dense_segment(
                jax.lax.slice_in_dim(table, offset,
                                     offset + (res + 1) ** 3), res
            )
            flat, w = _dense_cell_index_weights(uc, res, table.dtype)
            rows = jnp.take(packed, flat, axis=0)  # (..., 8F)
            rows = rows.reshape(*rows.shape[:-1], 8, F)
            features.append(jnp.sum(rows * w[..., None], axis=-2))
        elif mode == "cellhash":
            packed = jax.lax.slice_in_dim(
                table, offset, offset + size
            ).reshape(size // 8, 8 * F)
            h, w = _cellhash_index_weights(uc, res, size, table.dtype)
            rows = jnp.take(packed, h, axis=0)  # (..., 8F)
            rows = rows.reshape(*rows.shape[:-1], 8, F)
            features.append(jnp.sum(rows * w[..., None], axis=-2))
        else:
            idx, w = _level_indices_weights(
                uc, res, size, offset, mode, table.dtype
            )
            gathered = jnp.take(table, idx, axis=0)  # (..., 8, F)
            features.append(jnp.sum(gathered * w[..., None], axis=-2))
    return jnp.concatenate(features, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_frozen_pos(levels, table, u):
    return _encode_impl(table, u, levels)


def _encode_frozen_pos_fwd(levels, table, u):
    return _encode_impl(table, u, levels), u


def _encode_frozen_pos_bwd(levels, res_data, g):
    """Table gradient via per-channel single-column scatter-adds.

    The autodiff-generated backward scatter-adds (..., 8, F) row updates
    into the (T, F) table; on TPU the F=2 minor dim tile-pads to 128 lanes
    and the scatter runs ~12x slower than F separate single-channel adds
    (measured 1.37s vs 0.11s per 16M at F=2). Positions receive zero
    cotangent (they are non-differentiable in this framework's render
    path: sample positions are stop-gradiented and rays derive from
    constants — models/renderer.py).
    """
    u = res_data
    last_res, last_size, last_offset, _ = levels[-1]
    T = last_offset + last_size  # total table rows (grid_layout contract)
    F = g.shape[-1] // len(levels)
    table_dtype = g.dtype
    uc = jnp.clip(u, 0.0, 1.0)
    grad_cols = [
        jnp.zeros((T,), table_dtype) for _ in range(F)
    ]
    dense_grads = []  # (offset, vertex-grad segment) pairs
    for li, (res, size, offset, mode) in enumerate(levels):
        g_level = g[..., li * F:(li + 1) * F]  # (..., F)
        if mode == "dense":
            # scatter 8F-float cell-corner rows (same per-element cost as
            # F single-channel adds, ~6x fewer index ops), then fold the
            # packed grads back onto shared vertices by shifted slice-adds
            flat, w = _dense_cell_index_weights(uc, res, table_dtype)
            contrib = (
                w[..., None] * g_level[..., None, :]
            ).reshape(-1, 8 * F)
            packed_grad = jnp.zeros(
                (res ** 3, 8 * F), table_dtype
            ).at[flat.reshape(-1)].add(contrib)
            dense_grads.append((offset, _fold_dense_segment_grad(
                packed_grad, res, F, table_dtype
            )))
            continue
        if mode == "cellhash":
            h, w = _cellhash_index_weights(uc, res, size, table_dtype)
            contrib = (
                w[..., None] * g_level[..., None, :]
            ).reshape(-1, 8 * F)
            packed_grad = jnp.zeros(
                (size // 8, 8 * F), table_dtype
            ).at[h.reshape(-1)].add(contrib)
            dense_grads.append((offset, packed_grad.reshape(size, F)))
            continue
        idx, w = _level_indices_weights(
            uc, res, size, offset, mode, table_dtype
        )
        flat_idx = idx.reshape(-1)
        if os.environ.get("DENERF_HASH_BWD", "sort") == "sort":
            # sort-by-index + cumsum + boundary-diff: an exact segment
            # sum with ZERO scatters (grad[t] = csum[hi(t)] -
            # csum[lo(t)], boundaries via searchsorted on the sorted
            # keys). Default since r4: 5.15 ns/elem-equiv vs 42.9 for
            # the direct scatter (scripts/perf_microbench.py, TPU v5
            # lite), and the full-buffer scatter (prepass div=1)
            # repeatedly faulted the device where this path ran clean.
            # Opt back into the scatter with DENERF_HASH_BWD=scatter.
            local_idx = flat_idx - offset
            payloads = tuple(
                (w * g_level[..., f:f + 1]).reshape(-1)
                for f in range(F)
            )
            sorted_all = jax.lax.sort((local_idx,) + payloads,
                                      num_keys=1)
            sidx = sorted_all[0]
            bounds = jnp.searchsorted(
                sidx, jnp.arange(size + 1, dtype=sidx.dtype),
                method="scan_unrolled",
            )
            lo, hi = bounds[:-1], bounds[1:]
            segs = []
            for f in range(F):
                c = jnp.cumsum(sorted_all[1 + f])
                hi_v = c[jnp.maximum(hi - 1, 0)]
                lo_v = jnp.where(lo > 0, c[jnp.maximum(lo - 1, 0)], 0.0)
                segs.append(jnp.where(hi > lo, hi_v - lo_v, 0.0))
            dense_grads.append((offset, jnp.stack(segs, axis=-1)))
            continue
        for f in range(F):
            contrib = (w * g_level[..., f:f + 1]).reshape(-1)
            grad_cols[f] = grad_cols[f].at[flat_idx].add(contrib)
    grad_table = jnp.stack(grad_cols, axis=-1)
    for offset, seg in dense_grads:
        grad_table = jax.lax.dynamic_update_slice_in_dim(
            grad_table,
            jax.lax.dynamic_slice_in_dim(grad_table, offset,
                                         seg.shape[0]) + seg,
            offset, axis=0,
        )
    return grad_table, jnp.zeros_like(u)


_encode_frozen_pos.defvjp(_encode_frozen_pos_fwd, _encode_frozen_pos_bwd)


def encode(table, u, levels, differentiable_positions=True):
    """Multi-resolution grid encode.

    Args:
        table: (total_table_size, F) feature table parameter.
        u: (..., 3) positions in the contracted unit cube [0, 1]^3
           (out-of-range positions clamp; the field's selector mask handles
           validity).
        levels: static layout from `grid_layout`.
        differentiable_positions: when False, positions get a zero
            cotangent and the table gradient uses the fast per-channel
            scatter path. The training render path never differentiates
            positions (they are stop-gradiented at the sampler), so the
            field uses False; keep True wherever position gradients could
            matter (e.g. future pose refinement).
    Returns:
        (..., n_levels * F) features, dtype of `table`.
    """
    if differentiable_positions:
        return _encode_impl(table, u, levels)
    return _encode_frozen_pos(tuple(levels), table, u)
