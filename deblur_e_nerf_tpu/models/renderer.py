"""Occupancy-gated volumetric rendering with static shapes.

TPU-native replacement for nerfacc's `ray_marching` + `rendering` CUDA path
(reference: external/utils.py:38-140, external/vol_rendering.py:16-128).
nerfacc emits variable-length packed samples; XLA needs static shapes, so the
design here is:

1. March (no gradients): rays are processed in fixed-size chunks under a
   `lax.scan`. For every ray a closed-form step sequence (uniform steps,
   switching to geometric growth under cone-angle stepping) is intersected
   with the scene AABB / near-far planes and the occupancy grid; surviving
   samples are compacted into a flat, ray-major sample buffer of static
   budget K via cumsum-indexed scatters. The result is the nerfacc "packed
   samples" layout — (t_mid, dt, ray_idx) — but with a fixed capacity.
2. Field evaluation runs once on the compacted buffer (dense MXU matmuls,
   zero padding waste up to the budget tail). Unlike the reference there is
   no separate density pre-pass: occupancy already pruned empty space, and
   early termination is applied as a transmittance mask in compositing, so
   we trade a full duplicate density pass (reference `sigma_fn`) for a small
   masked tail — strictly fewer FLOPs at equal semantics.
3. Composite: per-ray exclusive transmittance via one global cumsum plus a
   segment-base gather (samples are ray-contiguous by construction), then
   `segment_sum` accumulation of color/opacity/depth.

Samples beyond the K budget are dropped (counted, so callers can observe
overflow); the training loop's dynamic batch sizing keeps the expected
sample count pinned to the budget, mirroring the reference's constant
ray-sample batch invariant (reference: models/deblur_e_nerf.py:1252-1308).
"""

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import contraction as contraction_lib
from . import occupancy


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable; safe as a jit static arg)."""
    aabb: Tuple[float, ...]                 # (6,) scene aabb
    contraction_type: contraction_lib.ContractionType
    grid_resolution: int
    near_plane: Optional[float]
    far_plane: Optional[float]
    render_step_size: float
    cone_angle: float = 0.0
    early_stop_eps: float = 1e-4
    alpha_thre: float = 0.0
    stratified: bool = False
    max_samples_per_ray: int = 1024         # S_max
    sample_budget: int = 1 << 17            # K: flat sample buffer capacity
    march_chunk: int = 4096                 # rays per march scan step
    field_chunk: int = 0                    # samples per field eval (0 = all)
    opacity_eps: float = 1e-10


class RaySamples(NamedTuple):
    """Flat compacted sample buffers (static capacity K+1; slot K = trash)."""
    t_mid: jnp.ndarray     # (K+1,) float32
    dt: jnp.ndarray        # (K+1,) float32
    ray_idx: jnp.ndarray   # (K+1,) int32; == n_rays for empty slots
    counts: jnp.ndarray    # (R,) int32 valid samples per ray
    offsets: jnp.ndarray   # (R,) int32 exclusive-cumsum of counts
    num_samples: jnp.ndarray  # () int32 total valid samples (may exceed K)


def _ray_t_bounds(rays_o, rays_d, rc):
    """Per-ray [t_near, t_far] from scene AABB and near/far planes."""
    near = 0.0 if rc.near_plane is None else rc.near_plane
    far = jnp.inf if rc.far_plane is None else rc.far_plane
    t_near = jnp.full(rays_o.shape[:-1], near, jnp.float32)
    t_far = jnp.full(rays_o.shape[:-1], far, jnp.float32)
    if rc.contraction_type == contraction_lib.ContractionType.AABB:
        aabb = jnp.asarray(rc.aabb, jnp.float32)
        safe_d = jnp.where(jnp.abs(rays_d) < 1e-10, 1e-10, rays_d)
        inv_d = 1.0 / safe_d
        t0 = (aabb[:3] - rays_o) * inv_d
        t1 = (aabb[3:] - rays_o) * inv_d
        t_in = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_out = jnp.min(jnp.maximum(t0, t1), axis=-1)
        t_near = jnp.maximum(t_near, t_in)
        t_far = jnp.minimum(t_far, t_out)
    return t_near, t_far


def _step_sequence(t_start, rc):
    """Closed-form marching timeline t_0..t_{S}, shape (..., S_max + 1).

    cone_angle == 0: uniform steps of render_step_size.
    cone_angle > 0: uniform until t * cone_angle > step, then geometric
    growth t_{k+1} = t_k * (1 + cone_angle) — the closed form of nerfacc's
    `dt = clamp(t * cone_angle, min=step)` recurrence.
    """
    S = rc.max_samples_per_ray
    step = rc.render_step_size
    k = jnp.arange(S + 1, dtype=jnp.float32)
    if rc.cone_angle <= 0.0:
        return t_start[..., None] + k * step
    cone = rc.cone_angle
    t_cross = step / cone
    # uniform steps until crossing t_cross
    m = jnp.ceil(
        jnp.maximum(t_cross - t_start, 0.0) / step
    )[..., None]  # (..., 1)
    t_uniform = t_start[..., None] + k * step
    t_at_m = t_start[..., None] + m * step
    t_geom = t_at_m * (1.0 + cone) ** jnp.maximum(k - m, 0.0)
    return jnp.where(k <= m, t_uniform, t_geom)


def march_rays(binary, rays_o, rays_d, ray_mask, key, rc):
    """Occupancy-gated marching with flat compaction.

    Args:
        binary: (grid_resolution**3,) bool occupancy mask.
        rays_o, rays_d: (R, 3) float32; directions unit-norm.
        ray_mask: (R,) bool; inactive rays produce no samples.
        key: PRNG key for stratified jitter.
        rc: RenderConfig (static).
    Returns:
        RaySamples.
    """
    R = rays_o.shape[0]
    K = rc.sample_budget
    S = rc.max_samples_per_ray
    C = min(rc.march_chunk, R)
    n_chunks = -(-R // C)
    R_pad = n_chunks * C

    def pad(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((R_pad - R, *x.shape[1:]), fill, x.dtype)]
        ) if R_pad > R else x

    rays_o_p = pad(rays_o)
    rays_d_p = pad(rays_d, fill=1.0)
    mask_p = pad(ray_mask, fill=False)

    t_near, t_far = _ray_t_bounds(rays_o_p, rays_d_p, rc)
    if rc.stratified:
        jitter = jax.random.uniform(
            key, (R_pad,), dtype=jnp.float32
        )
        t_near = t_near + jitter * rc.render_step_size
    aabb = jnp.asarray(rc.aabb, jnp.float32)

    def chunk_body(carry, chunk):
        t_buf, dt_buf, idx_buf, cursor = carry
        o, d, m, tn, tf, base_idx = chunk

        timeline = _step_sequence(tn, rc)            # (C, S+1)
        t0, t1 = timeline[:, :-1], timeline[:, 1:]    # (C, S)
        t_mid = 0.5 * (t0 + t1)
        pos = o[:, None, :] + d[:, None, :] * t_mid[..., None]
        u = contraction_lib.contract(pos, aabb, rc.contraction_type)
        occ = occupancy.query(
            occupancy.OccupancyGridState(occs=None, binary=binary),
            u, rc.grid_resolution,
        )
        valid = occ & (t_mid < tf[:, None]) & (t_mid >= tn[:, None]) \
            & m[:, None]

        flat_valid = valid.reshape(-1)
        pos_in_chunk = jnp.cumsum(flat_valid.astype(jnp.int32)) \
            - flat_valid.astype(jnp.int32)
        write_idx = cursor + pos_in_chunk
        write_idx = jnp.where(
            flat_valid & (write_idx < K), write_idx, K
        )
        t_buf = t_buf.at[write_idx].set(t_mid.reshape(-1), mode="drop")
        dt_buf = dt_buf.at[write_idx].set(
            (t1 - t0).reshape(-1), mode="drop"
        )
        ray_ids = jnp.broadcast_to(
            base_idx[:, None], (C, S)
        ).reshape(-1)
        idx_buf = idx_buf.at[write_idx].set(ray_ids, mode="drop")

        chunk_counts = jnp.sum(valid, axis=1, dtype=jnp.int32)
        cursor = cursor + jnp.sum(chunk_counts, dtype=jnp.int32)
        return (t_buf, dt_buf, idx_buf, cursor), chunk_counts

    init = (
        jnp.zeros((K + 1,), jnp.float32),
        jnp.zeros((K + 1,), jnp.float32),
        jnp.full((K + 1,), R, jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    chunks = (
        rays_o_p.reshape(n_chunks, C, 3),
        rays_d_p.reshape(n_chunks, C, 3),
        mask_p.reshape(n_chunks, C),
        t_near.reshape(n_chunks, C),
        t_far.reshape(n_chunks, C),
        jnp.arange(R_pad, dtype=jnp.int32).reshape(n_chunks, C),
    )
    (t_buf, dt_buf, idx_buf, cursor), counts = jax.lax.scan(
        chunk_body, init, chunks
    )
    counts = counts.reshape(R_pad)[:R]
    offsets = jnp.cumsum(counts) - counts
    # rays beyond R (padding) emitted nothing (mask False), so cursor is the
    # true total; slot-K trash and >=K drops are excluded by construction
    return RaySamples(
        t_mid=t_buf, dt=dt_buf, ray_idx=idx_buf, counts=counts,
        offsets=offsets.astype(jnp.int32), num_samples=cursor,
    )


def composite(sigma, rgb, samples, n_rays, rc, render_bkgd=None):
    """Differentiable compositing over flat ray-contiguous samples.

    Args:
        sigma: (K+1,) float32 densities (slot K ignored).
        rgb: (K+1, ch) float32 radiance.
        samples: RaySamples from march_rays.
        n_rays: static int R.
        rc: RenderConfig.
        render_bkgd: optional (ch,) background radiance to alpha-over.
    Returns:
        colors (R, ch), opacities (R,), depths (R,),
        num_rendering_samples () int32 — samples contributing before early
        termination (the dynamic-batch-size signal, nerfacc parity).
    """
    K = rc.sample_budget
    slot_valid = samples.ray_idx < n_rays  # (K+1,); slot K has ray_idx == R
    sigma_dt = sigma * samples.dt * slot_valid
    alpha = 1.0 - jnp.exp(-sigma_dt)
    if rc.alpha_thre > 0:
        keep = alpha >= rc.alpha_thre
        sigma_dt = sigma_dt * keep
        alpha = alpha * keep

    cum = jnp.cumsum(sigma_dt)
    seg_base = jnp.where(
        samples.offsets > 0,
        cum[jnp.clip(samples.offsets - 1, 0, K)],
        0.0,
    )  # (R,)
    safe_ray_idx = jnp.clip(samples.ray_idx, 0, n_rays - 1)
    trans_excl = jnp.exp(
        -(cum - sigma_dt - seg_base[safe_ray_idx])
    )
    live = trans_excl > rc.early_stop_eps
    weights = trans_excl * alpha * live * slot_valid

    seg_ids = jnp.where(samples.ray_idx < n_rays, samples.ray_idx, n_rays)
    colors = jax.ops.segment_sum(
        weights[:, None] * rgb, seg_ids, num_segments=n_rays + 1
    )[:n_rays]
    opacities = jax.ops.segment_sum(
        weights, seg_ids, num_segments=n_rays + 1
    )[:n_rays]
    depths = jax.ops.segment_sum(
        weights * samples.t_mid, seg_ids, num_segments=n_rays + 1
    )[:n_rays]

    num_rendering_samples = jnp.sum(
        (slot_valid & live).astype(jnp.int32)
    )
    if render_bkgd is not None:
        colors = colors + render_bkgd * (1.0 - opacities[:, None])
    return colors, opacities, depths, num_rendering_samples


def render_rays(field_fn, binary, rays_o, rays_d, ray_mask, key, rc,
                render_bkgd=None):
    """Full render: march -> field eval on compacted samples -> composite.

    Args:
        field_fn: (positions (N,3), directions (N,3)) -> (rgb (N,ch),
            density (N,1)); typically a bound flax apply.
        binary: occupancy mask (grid_resolution**3,).
        rays_o, rays_d, ray_mask: (R, 3)/(R,) ray bundle.
        key: PRNG key (stratified jitter).
        rc: RenderConfig.
        render_bkgd: optional (ch,) learnable/fixed background radiance.
    Returns:
        dict with radiance (R, ch), opacity (R,), depth (R,),
        num_rendering_samples (), num_marched_samples (), counts (R,).
    """
    R = rays_o.shape[0]
    samples = march_rays(binary, rays_o, rays_d, ray_mask, key, rc)
    samples = jax.tree_util.tree_map(jax.lax.stop_gradient, samples)

    safe_idx = jnp.clip(samples.ray_idx, 0, R - 1)
    positions = rays_o[safe_idx] \
        + rays_d[safe_idx] * samples.t_mid[:, None]
    directions = rays_d[safe_idx]

    if rc.field_chunk and rc.field_chunk < positions.shape[0]:
        F = rc.field_chunk
        n = positions.shape[0]
        n_pad = -(-n // F) * F
        pos_p = jnp.concatenate(
            [positions, jnp.zeros((n_pad - n, 3), positions.dtype)]
        ).reshape(-1, F, 3)
        dir_p = jnp.concatenate(
            [directions, jnp.ones((n_pad - n, 3), directions.dtype)]
        ).reshape(-1, F, 3)
        rgb, density = jax.lax.map(
            lambda pd: jax.checkpoint(field_fn)(pd[0], pd[1]),
            (pos_p, dir_p),
        )
        rgb = rgb.reshape(n_pad, -1)[:n]
        density = density.reshape(n_pad, -1)[:n]
    else:
        rgb, density = field_fn(positions, directions)

    colors, opacities, depths, num_rendering_samples = composite(
        density[..., 0], rgb, samples, R, rc, render_bkgd
    )
    return {
        "radiance": colors,
        "opacity": opacities,
        "depth": depths / (opacities + rc.opacity_eps),
        "num_rendering_samples": num_rendering_samples,
        "num_marched_samples": samples.num_samples,
        "counts": samples.counts,
    }
