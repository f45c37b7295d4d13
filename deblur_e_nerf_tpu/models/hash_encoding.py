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

from ..ops import compensated

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


def _group_size():
    """Max levels per batched gather group. The batched (..., L, 8)
    index/row intermediates put (L, 8) on the minor axes, which the TPU
    tile-pads 16x — at the renderer's 2M-sample field chunks a full
    16-level batch is ~11 GB of fusion intermediates (measured OOM),
    and a G=4 quality-scale step stalled the remote TPU compile > 37
    min where singleton groups (the round-4 program shape) compile in
    minutes. Default 1 until a TPU A/B proves a larger group; tune via
    DENERF_ENCODE_GROUP.
    """
    return max(int(os.environ.get("DENERF_ENCODE_GROUP", "1")), 1)


def _group_levels(levels):
    """Group consecutive same-mode levels for batched gathers.

    'hash'/'tiled'/'cellhash' levels batch (per-level res/size/offset go
    into small constant arrays; ONE table gather serves the whole
    group, capped at _group_size() levels); 'dense' levels stay
    singleton (each needs its own packed cell-corner view). Returns
    [(mode, [(res, size, offset), ...])] in level order — concatenating
    group features in order reproduces the per-level feature layout
    exactly.
    """
    gmax = _group_size()
    groups = []
    for res, size, offset, mode in levels:
        if (mode != "dense" and groups and groups[-1][0] == mode
                and len(groups[-1][1]) < gmax):
            groups[-1][1].append((res, size, offset))
        else:
            groups.append((mode, [(res, size, offset)]))
    return groups


def _batched_vertex_group(table, uc, group, mode, compute_dtype,
                          acc_dtype):
    """Features for a batch of 'hash'/'tiled' levels with ONE gather.

    The per-hash-level Python loop used to emit one gather+lerp fusion
    per level per pass (measured: 36 identical 2.43s fusions = 27% of
    the round-4 protocol step); batching the levels into a single
    (..., L, 8) gather collapses them into one op (tcnn's single fused
    encoding kernel is the reference analog: external/ngp.py:166-187).
    """
    corner_offsets = jnp.asarray(_CORNER_OFFSETS)
    res_f = jnp.asarray([g[0] for g in group], uc.dtype)      # (L,)
    res_i = jnp.asarray([g[0] for g in group], jnp.int32)
    sizes = jnp.asarray([g[1] for g in group], jnp.uint32)
    offsets = jnp.asarray([g[2] for g in group], jnp.int32)
    scaled = uc[..., None, :] * res_f[:, None]                # (..., L, 3)
    cell = jnp.floor(scaled)
    frac = (scaled - cell).astype(acc_dtype)
    cell = cell.astype(jnp.int32)
    corners = cell[..., None, :] + corner_offsets             # (..., L, 8, 3)
    corners = jnp.clip(corners, 0, res_i[:, None, None])
    x = corners[..., 0].astype(jnp.uint32)
    y = corners[..., 1].astype(jnp.uint32)
    z = corners[..., 2].astype(jnp.uint32)
    if mode == "tiled":
        stride = (res_i[:, None] + 1).astype(jnp.uint32)
        idx = (z * stride + y) * stride + x
    else:  # hash
        idx = (
            x * jnp.uint32(_HASH_PRIMES[0])
            ^ y * jnp.uint32(_HASH_PRIMES[1])
            ^ z * jnp.uint32(_HASH_PRIMES[2])
        )
    idx = (idx % sizes[:, None]).astype(jnp.int32) \
        + offsets[:, None]                                    # (..., L, 8)
    w = jnp.prod(jnp.where(
        corner_offsets.astype(bool), frac[..., None, :],
        1.0 - frac[..., None, :],
    ), axis=-1)                                               # (..., L, 8)
    rows = jnp.take(table.astype(compute_dtype), idx, axis=0)
    feat = jnp.sum(rows.astype(acc_dtype) * w[..., None], axis=-2)
    return feat.reshape(*feat.shape[:-2], -1)                 # (..., L*F)


def _batched_cellhash_group(table, uc, group, compute_dtype, acc_dtype):
    """Features for a batch of 'cellhash' levels with ONE row gather.

    The whole table is viewed as (T//8, 8F) packed rows (all segment
    offsets/sizes are 128-aligned by grid_layout, so the reshape is a
    pure view); each level's cell hashes into its own row range via
    offset//8 + h.
    """
    F = table.shape[-1]
    T = table.shape[0]
    corner_offsets = jnp.asarray(_CORNER_OFFSETS)
    res_f = jnp.asarray([g[0] for g in group], uc.dtype)
    res_i = jnp.asarray([g[0] for g in group], jnp.int32)
    rows_per_level = jnp.asarray(
        [g[1] // 8 for g in group], jnp.uint32
    )
    row_offsets = jnp.asarray([g[2] // 8 for g in group], jnp.int32)
    scaled = uc[..., None, :] * res_f[:, None]                # (..., L, 3)
    cell = jnp.clip(jnp.floor(scaled), 0, res_i[:, None] - 1)
    frac = (scaled - cell).astype(acc_dtype)
    cell = cell.astype(jnp.uint32)
    h = (
        cell[..., 0] * jnp.uint32(_HASH_PRIMES[0])
        ^ cell[..., 1] * jnp.uint32(_HASH_PRIMES[1])
        ^ cell[..., 2] * jnp.uint32(_HASH_PRIMES[2])
    ) % rows_per_level                                        # (..., L)
    row_idx = h.astype(jnp.int32) + row_offsets
    w = jnp.prod(jnp.where(
        corner_offsets.astype(bool), frac[..., None, :],
        1.0 - frac[..., None, :],
    ), axis=-1)                                               # (..., L, 8)
    packed = table.astype(compute_dtype).reshape(T // 8, 8 * F)
    rows = jnp.take(packed, row_idx, axis=0)                  # (..., L, 8F)
    rows = rows.reshape(*rows.shape[:-1], 8, F)
    feat = jnp.sum(rows.astype(acc_dtype) * w[..., None], axis=-2)
    return feat.reshape(*feat.shape[:-2], -1)                 # (..., L*F)


def _encode_impl(table, u, levels, compute_dtype=None):
    """Grouped-gather encode. `compute_dtype` (e.g. bfloat16) rounds the
    gathered table VALUES only — indices/weights/accumulation stay f32,
    and the custom-VJP backward keeps exact f32 table gradients (the
    reference's tcnn encoding runs its table in fp16: external/ngp.py
    pins only the OUTPUT to f32, ngp.py:166-170)."""
    features = []
    uc = jnp.clip(u, 0.0, 1.0)
    F = table.shape[-1]
    cdtype = table.dtype if compute_dtype is None else compute_dtype
    # accumulation dtype: table dtype when no rounding was requested
    # (exactness tests run in f64), f32 when gathering in a reduced type
    acc = table.dtype if compute_dtype is None else jnp.float32
    for mode, group in _group_levels(levels):
        if mode == "dense":
            res, size, offset = group[0]
            # one 8F-float row gather per sample from the derived
            # cell-corner table (see _pack_dense_segment)
            packed = _pack_dense_segment(
                jax.lax.slice_in_dim(table, offset,
                                     offset + (res + 1) ** 3), res
            ).astype(cdtype)
            flat, w = _dense_cell_index_weights(uc, res, acc)
            rows = jnp.take(packed, flat, axis=0)  # (..., 8F)
            rows = rows.reshape(*rows.shape[:-1], 8, F)
            features.append(jnp.sum(
                rows.astype(acc) * w[..., None], axis=-2
            ))
        elif mode == "cellhash":
            features.append(
                _batched_cellhash_group(table, uc, group, cdtype, acc)
            )
        else:
            features.append(
                _batched_vertex_group(table, uc, group, mode, cdtype,
                                      acc)
            )
    return jnp.concatenate(features, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _encode_frozen_pos(levels, table, u, compute_dtype):
    return _encode_impl(table, u, levels, compute_dtype)


def _encode_frozen_pos_fwd(levels, table, u, compute_dtype):
    # the zero-size array only carries the PRIMAL table dtype: with a
    # reduced compute_dtype the cotangent g arrives in the f32
    # accumulation dtype, but custom_vjp must return the table gradient
    # in the primal dtype
    residual = (u, jnp.zeros((0,), table.dtype))
    return _encode_impl(table, u, levels, compute_dtype), residual


def _rowwise_sorted_segment_grad(keys, rows, n_rows):
    """Exact per-key row sums with ZERO scatters: sort the keys once
    (permutation payload), gather the contribution rows coherently in
    sorted order, one axis-0 blocked-compensated cumsum over the
    channels, then per-key boundary differences via searchsorted.

    Args:
        keys: (N,) int32 target row per contribution.
        rows: (N, C) float32 contribution rows.
        n_rows: static int — number of target rows.
    Returns:
        (n_rows, C) float32 summed rows.
    """
    perm = jnp.arange(keys.shape[0], dtype=jnp.int32)
    sidx, order = jax.lax.sort((keys, perm), num_keys=1)
    sorted_rows = jnp.take(rows, order, axis=0)
    within, bhi, blo = compensated.blocked_cumsum(sorted_rows)
    bounds = jnp.searchsorted(
        sidx, jnp.arange(n_rows + 1, dtype=sidx.dtype),
        method="scan_unrolled",
    )
    lo_b, hi_b = bounds[:-1], bounds[1:]
    B = compensated.DEFAULT_BLOCK
    hi_i = jnp.maximum(hi_b - 1, 0)
    lo_i = jnp.maximum(lo_b - 1, 0)
    has_lo = (lo_b > 0)[:, None]
    w_hi = within[hi_i]
    w_lo = jnp.where(has_lo, within[lo_i], 0.0)
    bh = bhi[hi_i // B] - jnp.where(has_lo, bhi[lo_i // B], 0.0)
    bl = blo[hi_i // B] - jnp.where(has_lo, blo[lo_i // B], 0.0)
    d, e = compensated.two_sum(bh, w_hi - w_lo)
    return jnp.where((hi_b > lo_b)[:, None], d + (e + bl), 0.0)


def _encode_frozen_pos_bwd(levels, compute_dtype, res_data, g):
    """Table gradient via per-channel single-column scatter-adds.

    The autodiff-generated backward scatter-adds (..., 8, F) row updates
    into the (T, F) table; on TPU the F=2 minor dim tile-pads to 128 lanes
    and the scatter runs ~12x slower than F separate single-channel adds
    (measured 1.37s vs 0.11s per 16M at F=2). Positions receive zero
    cotangent (they are non-differentiable in this framework's render
    path: sample positions are stop-gradiented and rays derive from
    constants — models/renderer.py).
    """
    u, table_proto = res_data
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
            # 8F-float cell-corner row grads (same per-element cost as
            # F single-channel adds, ~6x fewer index ops), then fold the
            # packed grads back onto shared vertices by shifted
            # slice-adds. Sort path by default: coarse dense cells get
            # MANY colliding contributions per row (e.g. 2M samples
            # over 16^3 cells), exactly where a direct row scatter-add
            # serializes worst.
            flat, w = _dense_cell_index_weights(uc, res, table_dtype)
            contrib = (
                w[..., None] * g_level[..., None, :]
            ).reshape(-1, 8 * F)
            dense_bwd = os.environ.get(
                "DENERF_DENSE_BWD",
                os.environ.get("DENERF_HASH_BWD", "sort"),
            )
            if dense_bwd == "sort":
                packed_grad = _rowwise_sorted_segment_grad(
                    flat.reshape(-1), contrib, res ** 3
                )
            else:
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
            hflat = h.reshape(-1)
            if os.environ.get("DENERF_HASH_BWD", "sort") == "sort":
                # sort+rowwise-cumsum+boundary-diff, the cellhash analog
                # of the vertex-hash sort backward below — no colliding
                # multi-channel scatter (the direct (rows, 16) f32
                # scatter-add measured ~413 ns/row on this backend)
                packed_grad = _rowwise_sorted_segment_grad(
                    hflat, contrib, size // 8
                )
            else:
                packed_grad = jnp.zeros(
                    (size // 8, 8 * F), table_dtype
                ).at[hflat].add(contrib)
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
            B = compensated.DEFAULT_BLOCK
            hi_i = jnp.maximum(hi - 1, 0)
            lo_i = jnp.maximum(lo - 1, 0)
            has_lo = (lo > 0)[:, None]
            # segment sum = csum[hi-1] - csum[lo-1] — but a plain
            # global f32 cumsum loses eps * |running prefix| per row
            # (ADVICE r4: silent gradient-precision regression at 16M+
            # contributions). Blocked compensated cumsum over BOTH
            # channels at once (one scan, not one per channel):
            # within-block differences are exact at block scale and
            # the block bases carry a double-f32 (hi, lo) pair.
            within, bhi, blo = compensated.blocked_cumsum(
                jnp.stack(sorted_all[1:], axis=-1), B
            )  # (N, F), (nb, F), (nb, F)
            w_hi = within[hi_i]
            w_lo = jnp.where(has_lo, within[lo_i], 0.0)
            bh = bhi[hi_i // B] - jnp.where(
                has_lo, bhi[lo_i // B], 0.0)
            bl = blo[hi_i // B] - jnp.where(
                has_lo, blo[lo_i // B], 0.0)
            d, e = compensated.two_sum(bh, w_hi - w_lo)
            segs = jnp.where((hi > lo)[:, None], d + (e + bl), 0.0)
            dense_grads.append((offset, segs))
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
    return grad_table.astype(table_proto.dtype), jnp.zeros_like(u)


_encode_frozen_pos.defvjp(_encode_frozen_pos_fwd, _encode_frozen_pos_bwd)


def encode(table, u, levels, differentiable_positions=True,
           compute_dtype=None):
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
        compute_dtype: optional dtype (e.g. jnp.bfloat16) the gathered
            table values are rounded to — halves the gather's HBM
            traffic, tcnn-fp16-style. Indices, trilinear weights, the
            feature accumulation, and the table GRADIENT all stay f32
            (the rounding is internal to the custom VJP, so grads keep
            full precision).
    Returns:
        (..., n_levels * F) float32 features.
    """
    if differentiable_positions:
        return _encode_impl(table, u, levels, compute_dtype)
    return _encode_frozen_pos(tuple(levels), table, u, compute_dtype)
