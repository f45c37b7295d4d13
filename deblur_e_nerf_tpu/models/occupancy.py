"""Dense occupancy grid with EMA updates, fully jit-compiled.

TPU-native replacement for nerfacc 0.3.1's CUDA `OccupancyGrid`
(used at reference: models/nerf.py:98-102, 200-204): a flat float32 `occs`
buffer plus a boolean `binary` view over a `resolution^3` grid in the
*contracted* coordinate space. Updates follow nerfacc's `every_n_step`
schedule: during warmup every cell is evaluated; afterwards a fixed-size
sample of uniform + currently-occupied cells (inverse-CDF categorical over
the binary mask — static shapes, no dynamic `nonzero`) gets an
EMA-max update, and the binary mask re-thresholds at
`min(occ_thre, mean(occs))`.

The occupancy-evaluation density query uses the cone-angle-dependent step
size sampled from random camera distances exactly as the reference's
`occ_eval_fn` (reference: models/nerf.py:170-198).
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import contraction as contraction_lib


class OccupancyGridState(NamedTuple):
    occs: jnp.ndarray    # (num_cells,) float32 EMA occupancy values
    binary: jnp.ndarray  # (num_cells,) bool occupancy mask


def init_state(resolution):
    num_cells = int(resolution) ** 3
    return OccupancyGridState(
        occs=jnp.zeros((num_cells,), jnp.float32),
        binary=jnp.zeros((num_cells,), bool),
    )


def cell_coords(resolution):
    """Integer (num_cells, 3) grid coordinates in x-fastest order."""
    r = jnp.arange(resolution, dtype=jnp.int32)
    z, y, x = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


def grid_index(u, resolution):
    """Contracted [0,1]^3 coords -> flat cell index (x-fastest), plus an
    in-grid validity mask."""
    scaled = u * resolution
    cell = jnp.floor(scaled).astype(jnp.int32)
    in_grid = jnp.all((cell >= 0) & (cell < resolution), axis=-1)
    cell = jnp.clip(cell, 0, resolution - 1)
    flat = (cell[..., 2] * resolution + cell[..., 1]) * resolution \
        + cell[..., 0]
    return flat, in_grid


def query(state, u, resolution):
    """Occupancy lookup at contracted coordinates; False outside the grid."""
    flat, in_grid = grid_index(u, resolution)
    return state.binary[flat] & in_grid


def sample_occupied_cells(key, state, n):
    """n cells ~ occupied distribution (with replacement), falling back
    to uniform when no cell is occupied.

    nerfacc samples occupied cells via `nonzero` (dynamic shape); here we use
    inverse-CDF sampling over the binary mask, which is exact, static-shaped,
    and cheap (one cumsum over the grid).
    """
    k_fallback, k_occ = jax.random.split(key)
    num_cells = state.binary.shape[0]
    uniform_cells = jax.random.randint(
        k_fallback, (n,), 0, num_cells, dtype=jnp.int32
    )
    weights = state.binary.astype(jnp.float32)
    cdf = jnp.cumsum(weights)
    total = cdf[-1]
    u = jax.random.uniform(k_occ, (n,), dtype=jnp.float32) \
        * jnp.maximum(total, 1.0)
    # 'scan_unrolled': log2(num_cells) batched gathers instead of the
    # default serial while-loop binary search
    occ_cells = jnp.searchsorted(
        cdf, u, side="right", method="scan_unrolled"
    ).astype(jnp.int32)
    occ_cells = jnp.clip(occ_cells, 0, num_cells - 1)
    return jnp.where(total > 0, occ_cells, uniform_cells)


def _sample_cells(key, state, n):
    """n uniform cells + n cells ~ occupied distribution."""
    k_uniform, k_occ = jax.random.split(key)
    num_cells = state.binary.shape[0]
    uniform_cells = jax.random.randint(
        k_uniform, (n,), 0, num_cells, dtype=jnp.int32
    )
    return jnp.concatenate(
        [uniform_cells, sample_occupied_cells(k_occ, state, n)]
    )


def make_occ_eval_fn(density_fn, render_step_size, cone_angle,
                     near_plane, far_plane):
    """Density * step-size occupancy evaluation
    (reference: models/nerf.py:170-198)."""

    def occ_eval_fn(key, x, camera_positions):
        if cone_angle > 0.0:
            cam_ids = jax.random.randint(
                key, (x.shape[0],), 0, camera_positions.shape[0]
            )
            origins = camera_positions[cam_ids]
            t = jnp.linalg.norm(origins - x, axis=-1, keepdims=True)
            step = jnp.maximum(t * cone_angle, render_step_size)
            if near_plane is not None and far_plane is not None:
                step = jnp.where(
                    (t > near_plane) & (t < far_plane), step, 0.0
                )
        else:
            step = jnp.asarray(render_step_size, jnp.float32)
        density = density_fn(x)
        return (density * step)[..., 0]

    return occ_eval_fn


def update(state, key, occ_eval_fn, camera_positions, step, *,
           resolution, aabb, contraction_type, occ_thre, ema_decay,
           warmup_steps, thre_floor=0.0, max_occupied_fraction=1.0,
           thre_rel_max=0.0):
    """One occupancy-grid update (call every `n` steps at accumulation
    boundaries, as the reference does; nerfacc `every_n_step` semantics).

    `step` is a traced int32 scalar; warmup-vs-sampled is a lax.cond so the
    update is one compiled program.
    """
    num_cells = state.binary.shape[0]
    n = num_cells // 4
    k_sample, k_jitter, k_eval = jax.random.split(key, 3)
    aabb = jnp.asarray(aabb, jnp.float32)

    def eval_cells(cells):
        coords = cell_coords(resolution)[cells]
        jitter = jax.random.uniform(
            k_jitter, coords.shape, dtype=jnp.float32
        )
        u = (coords.astype(jnp.float32) + jitter) / resolution
        x = contraction_lib.contract_inv(u, aabb, contraction_type)
        return occ_eval_fn(k_eval, x, camera_positions)

    def warmup_update(state):
        cells = jnp.arange(num_cells, dtype=jnp.int32)
        occ = eval_cells(cells)
        occs = jnp.maximum(state.occs * ema_decay, occ)
        return occs

    def sampled_update(state):
        cells = _sample_cells(k_sample, state, n)
        occ = eval_cells(cells)
        # EMA-max update on the sampled cells only; a de-duplicating mask
        # ensures cells sampled twice decay exactly once
        sampled = jnp.zeros((num_cells,), bool).at[cells].set(True)
        occs = jnp.where(sampled, state.occs * ema_decay, state.occs)
        occs = occs.at[cells].max(occ)
        return occs

    occs = jax.lax.cond(
        step < warmup_steps, warmup_update, sampled_update, state
    )
    # nerfacc's relative threshold min(mean, occ_thre) keeps early
    # training occupied, but under a density sparsity prior the mean
    # collapses toward 0 and NOISE cells marginally above it latch the
    # whole grid occupied (measured round 3: occ rate bursting
    # 0.03 -> 1.0 every ~400 steps, each collapsing the event batch).
    # `thre_floor` bounds the threshold below by an absolute per-step
    # opacity no visible surface is under (alpha ~ occs); 0 = exact
    # nerfacc semantics (reference via nerfacc.OccupancyGrid:
    # models/nerf.py:170-198)
    thre = jnp.minimum(jnp.mean(occs), occ_thre)
    if thre_floor > 0.0:
        thre = jnp.maximum(thre, thre_floor)
    # max-relative threshold: under event-only supervision a density
    # PEDESTAL (loss-invisible fog held at ~5e-3 opacity by the
    # sparsity prior) sits between the init level (~2e-3, where
    # nerfacc's relative min(mean, occ_thre) must stay permissive to
    # bootstrap) and the converged surface level (~0.5+) — no FIXED
    # threshold separates all three phases (measured round 3: floors
    # at 1e-4/1e-3 latched the pedestal grid-wide; 1e-2 left the init
    # grid 100% empty). Riding the field's dynamic range instead:
    # thr >= thre_rel_max * max(occs) is ~free at init (max ~ mean)
    # and rises above any sub-surface pedestal once a surface exists.
    if thre_rel_max > 0.0:
        thre = jnp.maximum(thre, thre_rel_max * jnp.max(occs))
    # occupied-fraction cap: an absolute floor cannot win the arms race
    # with the sparsity-prior pedestal (measured round 3: pedestal ~2e-4
    # latched a 1e-4 floor, then ~5e-3 latched a 1e-3 floor — each time
    # the grid went 100% occupied and the event batch collapsed ~25x).
    # Capping via the (1 - frac) quantile makes grid-wide latching
    # structurally impossible at ANY pedestal level while keeping the
    # top-occupancy (surface) cells marching. No-op while fewer than
    # `frac` of the cells exceed the base threshold.
    if max_occupied_fraction < 1.0:
        q = jnp.quantile(occs, 1.0 - max_occupied_fraction)
        thre = jnp.maximum(thre, q)
    binary = occs > thre
    return OccupancyGridState(occs=occs, binary=binary)
