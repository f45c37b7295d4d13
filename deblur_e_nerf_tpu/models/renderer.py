"""Occupancy-gated volumetric rendering with static shapes.

TPU-native replacement for nerfacc's `ray_marching` + `rendering` CUDA path
(reference: external/utils.py:38-140, external/vol_rendering.py:16-128).
nerfacc emits variable-length packed samples; XLA needs static shapes, so the
design here is:

1. March (no gradients): a closed-form step timeline (uniform steps,
   switching to geometric growth under cone-angle stepping) is intersected
   with the scene AABB / near-far planes and the occupancy grid, then
   compacted in two stages (coarse 8-step blocks on a dilated mask, exact
   per-sample tests on survivors) into a flat, ray-major sample buffer of
   static budget K. Only packed integer (ray, step) codes are scattered —
   single-channel, provably-unique indices, the one scatter shape the TPU
   executes at speed — and sample t/dt are re-derived analytically. The
   result is the nerfacc "packed samples" layout — (t_mid, dt, ray_idx) —
   but with a fixed capacity.
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
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import compensated
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
    block_budget: Optional[int] = None      # KB: coarse-block buffer
                                            # capacity (None = K // 4)
    # KSB: superblock buffer capacity. None = KB // 2; 0 disables the
    # superblock stage entirely (dense block pass) — the right choice
    # when the ray count is large relative to the sample budget (blur
    # training: R = capacity x S x slices) and the pooled mask filters
    # little, so stage 0 would mostly truncate
    superblock_budget: Optional[int] = None
    field_chunk: int = 0                    # samples per field eval (0 = all)
    # occlusion prepass (early-termination compaction): the post-cull
    # buffer holds sample_budget // prepass_div samples (0 = off); a
    # divisor, not an absolute, so eval's worst-case budget replacement
    # rescales it automatically. nerfacc STOPS MARCHING at
    # early_stop_eps, so the reference's field never evaluates occluded
    # samples; a mask-only design pays full encode fwd+bwd for them. The
    # prepass runs a stop-gradient density-only forward over all marched
    # samples, cuts each ray's dead suffix (transmittance is monotone,
    # so `trans > eps` is a per-ray prefix — the cut is gradient-exact:
    # dead samples' weights AND their cotangents are identically zero),
    # and compacts survivors into this smaller buffer for the full
    # differentiable field eval. (reference consumes this via nerfacc's
    # ray_marching early termination: external/utils.py:106-119)
    prepass_div: int = 0
    opacity_eps: float = 1e-10

    @property
    def prepass_budget(self):
        if not self.prepass_div:
            return None
        return max(self.sample_budget // self.prepass_div, 1)


class RaySamples(NamedTuple):
    """Flat compacted sample buffers (static capacity K+1; slot K = trash)."""
    t_mid: jnp.ndarray     # (K+1,) float32
    dt: jnp.ndarray        # (K+1,) float32
    ray_idx: jnp.ndarray   # (K+1,) int32; == n_rays for empty slots
    counts: jnp.ndarray    # (R,) int32 valid samples per ray
    offsets: jnp.ndarray   # (R,) int32 exclusive-cumsum of counts
    num_samples: jnp.ndarray  # () int32 total valid samples (may exceed K)
    # compaction demand of the coarse stages (may exceed their budgets —
    # the overflow-visibility signal for the block/superblock buffers;
    # None when the stage did not run)
    num_blocks: Optional[jnp.ndarray] = None       # () int32
    num_superblocks: Optional[jnp.ndarray] = None  # () int32
    # (R,) bool: False when the ray lost block/superblock entries to a
    # coarse-stage buffer overflow — such rays' sample counts UNDERCOUNT
    # true demand, so the `offsets + counts <= K` completeness test alone
    # would falsely mark them complete and the loss would train on
    # silently-truncated renders (the round-1 collapse mechanism, one
    # stage earlier). None when the march did not run (prepass output
    # copies it through).
    coarse_complete: Optional[jnp.ndarray] = None


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


def _timeline_at(k, t_start, rc):
    """Closed-form marching timeline value t_k (k float32, broadcastable
    against t_start).

    cone_angle == 0: uniform steps of render_step_size.
    cone_angle > 0: uniform until t * cone_angle > step, then geometric
    growth t_{k+1} = t_k * (1 + cone_angle) — the closed form of nerfacc's
    `dt = clamp(t * cone_angle, min=step)` recurrence.
    """
    step = rc.render_step_size
    if rc.cone_angle <= 0.0:
        return t_start + k * step
    cone = rc.cone_angle
    t_cross = step / cone
    m = jnp.ceil(jnp.maximum(t_cross - t_start, 0.0) / step)
    t_uniform = t_start + k * step
    t_at_m = t_start + m * step
    t_geom = t_at_m * (1.0 + cone) ** jnp.maximum(k - m, 0.0)
    return jnp.where(k <= m, t_uniform, t_geom)


def _step_sequence(t_start, rc):
    """Timeline t_0..t_S, shape (..., S_max + 1)."""
    S = rc.max_samples_per_ray
    k = jnp.arange(S + 1, dtype=jnp.float32)
    return _timeline_at(k, t_start[..., None], rc)


def _dilate_binary(binary, resolution):
    """3^3 max-pool (one-cell dilation) of the flat occupancy mask."""
    g = binary.reshape(resolution, resolution, resolution)
    for axis in range(3):
        lo = jnp.concatenate(
            [g[tuple(slice(None) if a != axis else slice(1, None)
                    for a in range(3))],
             jnp.zeros_like(g.take(jnp.asarray([0]), axis=axis))],
            axis=axis,
        )
        hi = jnp.concatenate(
            [jnp.zeros_like(g.take(jnp.asarray([0]), axis=axis)),
             g[tuple(slice(None) if a != axis else slice(0, -1)
                     for a in range(3))]],
            axis=axis,
        )
        g = g | lo | hi
    return g.reshape(-1)


BLOCK_STEPS = 8   # timeline steps per coarse block (~one grid cell)
SB_BLOCKS = 4     # blocks per superblock (stage 0), 32 steps
POOL = 4          # occupancy pooling factor for the superblock mask


def _maxpool_binary(binary, resolution, pool):
    """`pool`x max-pool of the flat occupancy mask -> (res/pool)^3 flat."""
    r = resolution // pool
    g = binary.reshape(r, pool, r, pool, r, pool)
    return jnp.any(g, axis=(1, 3, 5)).reshape(-1)


def _compact(flags, payload, budget, fill, return_cutoff=False):
    """Stream-compact `payload[flags]` into a (budget + 1,) buffer.

    Single-channel scatter with provably-unique in-bounds indices
    (cumsum positions); invalid/overflow lanes write out of bounds and
    drop. Slot `budget` is a never-written trash slot holding `fill`.
    Returns (buffer, total_flag_count).

    With return_cutoff, additionally returns the minimum DROPPED payload
    code (== `fill` when nothing dropped). Because csum is nondecreasing
    along lanes and the callers' lanes are code-ascending (ray-major),
    drops are exactly a suffix in code order — so every code below the
    cutoff is fully in the buffer. One min-reduce; no extra scatters.
    """
    flags_i = flags.astype(jnp.int32)
    csum = jnp.cumsum(flags_i)
    write_idx = jnp.where(
        flags & (csum <= budget), csum - 1, budget + 1
    )
    buf = jnp.full((budget + 1,), fill, payload.dtype).at[write_idx].set(
        payload, mode="drop", unique_indices=True
    )
    if return_cutoff:
        dropped_min = jnp.min(
            jnp.where(flags & (csum > budget), payload, fill)
        )
        return buf, csum[-1], dropped_min
    return buf, csum[-1]


def march_rays(binary, rays_o, rays_d, ray_mask, key, rc):
    """Occupancy-gated marching with two-stage gather compaction.

    TPU-native redesign of nerfacc's per-ray DDA traversal: per-sample
    scatters do not vectorize on TPU, so the march compacts **packed
    integer payloads** (ray and step indices; sample t/dt are re-derived
    from the closed-form timeline) in two stages:

      1. block pass: the S_max timeline is split into 8-step blocks
         (~one occupancy cell each); block midpoints are tested against a
         one-cell-dilated occupancy mask (conservative superset), and
         surviving (ray, block) codes are stream-compacted.
      2. sample pass: each surviving block expands to its 8 samples, which
         get the EXACT per-sample test of the reference semantics
         (occupancy at the sample midpoint + [t_near, t_far) bounds);
         surviving (ray, step) codes are compacted into the flat sample
         buffer.

    Compactions are single-channel scatters with unique indices
    (~7ns/lane); everything else is elementwise or a gather.

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
    n_blocks = -(-S // BLOCK_STEPS)
    KB = rc.block_budget or max(K // 4, 1)
    aabb = jnp.asarray(rc.aabb, jnp.float32)

    t_near, t_far = _ray_t_bounds(rays_o, rays_d, rc)
    if rc.stratified:
        jitter = jax.random.uniform(key, (R,), dtype=jnp.float32)
        t_near = t_near + jitter * rc.render_step_size

    # ---- stage 1: block pass on the dilated grid -----------------------
    dilated = _dilate_binary(binary, rc.grid_resolution)

    # stage-0 conservativeness needs the superblock-midpoint-to-block-
    # midpoint distance (<= (SB_BLOCKS*BLOCK_STEPS + BLOCK_STEPS)/2
    # uniform steps) to fit inside the two pooled dilations — with a
    # manual render_step_size, high occ resolution, or a strongly
    # anisotropic aabb the margin can exceed 2 pooled cells, so the
    # geometry is checked statically and the march falls back to the
    # full block pass otherwise
    min_cell_extent = min(
        (rc.aabb[3 + i] - rc.aabb[i]) / rc.grid_resolution
        for i in range(3)
    )
    sb_reach = (
        (SB_BLOCKS * BLOCK_STEPS / 2 + BLOCK_STEPS / 2)
        * rc.render_step_size
    )
    use_superblocks = (
        rc.cone_angle <= 0.0                      # uniform step timeline
        and rc.grid_resolution % POOL == 0
        and n_blocks % SB_BLOCKS == 0
        and n_blocks >= 2 * SB_BLOCKS
        and sb_reach <= 2 * POOL * min_cell_extent
        and rc.superblock_budget != 0
    )
    if use_superblocks:
        # ---- stage 0: superblock pass on a pooled+dilated mask ---------
        # (R, NB) block-midpoint queries dominated stage-1 cost; testing
        # 32-step superblocks against a POOLx-pooled, twice-dilated view
        # of the (already fine-dilated) mask cuts the dense query grid
        # 4x. Conservativeness: any stage-1-passing block midpoint lies
        # in an occupied fine-dilated cell; its superblock midpoint is
        # <= 12 uniform steps away (< 0.7 pooled cells at default
        # geometry), so two pooled dilations keep stage 0 a superset.
        pooled_res = rc.grid_resolution // POOL
        pooled = _maxpool_binary(dilated, rc.grid_resolution, POOL)
        pooled = _dilate_binary(pooled, pooled_res)
        pooled = _dilate_binary(pooled, pooled_res)
        n_sb = n_blocks // SB_BLOCKS
        KSB = rc.superblock_budget or max(KB // 2, 1)
        sb = jnp.arange(n_sb, dtype=jnp.float32)
        sb_steps = SB_BLOCKS * BLOCK_STEPS
        t_sb_mid = _timeline_at(sb * sb_steps + sb_steps / 2,
                                t_near[:, None], rc)  # (R, NSB)
        t_sb_lo = _timeline_at(sb * sb_steps, t_near[:, None], rc)
        t_sb_hi = _timeline_at((sb + 1) * sb_steps, t_near[:, None], rc)
        pos = rays_o[:, None, :] + rays_d[:, None, :] \
            * t_sb_mid[..., None]
        u = contraction_lib.contract(pos, aabb, rc.contraction_type)
        cell, _ = occupancy.grid_index(
            jnp.clip(u, 0.0, 1.0 - 1e-7), pooled_res
        )
        sb_valid = (
            pooled[cell]
            & (t_sb_lo < t_far[:, None])
            & (t_sb_hi > t_near[:, None])
            & ray_mask[:, None]
        )
        sb_code = (
            jnp.arange(R, dtype=jnp.int32)[:, None] * n_sb
            + jnp.arange(n_sb, dtype=jnp.int32)[None, :]
        )
        sb_buf, num_superblocks, sb_cut = _compact(
            sb_valid.reshape(-1), sb_code.reshape(-1), KSB,
            fill=jnp.int32(R * n_sb), return_cutoff=True,
        )  # (KSB + 1,)
        # first ray with any dropped superblock (== R when none dropped)
        first_bad_ray = sb_cut // n_sb
        sb_ray = jnp.minimum(sb_buf // n_sb, R - 1)
        sb_active = sb_buf < R * n_sb
        # expand each surviving superblock to its blocks (ray-major,
        # block-ascending order is preserved end to end)
        cand_ray = jnp.broadcast_to(
            sb_ray[:, None], (KSB + 1, SB_BLOCKS)
        )
        cand_blk = (
            (sb_buf % n_sb)[:, None] * SB_BLOCKS
            + jnp.arange(SB_BLOCKS, dtype=jnp.int32)[None, :]
        )
        cand_active = sb_active[:, None]
        tn_c = t_near[sb_ray][:, None]
        tf_c = t_far[sb_ray][:, None]
        o_c = rays_o[sb_ray][:, None, :]
        d_c = rays_d[sb_ray][:, None, :]
    else:
        num_superblocks = None
        first_bad_ray = jnp.int32(R)
        cand_ray = jnp.broadcast_to(
            jnp.arange(R, dtype=jnp.int32)[:, None], (R, n_blocks)
        )
        cand_blk = jnp.broadcast_to(
            jnp.arange(n_blocks, dtype=jnp.int32)[None, :],
            (R, n_blocks),
        )
        cand_active = ray_mask[:, None]
        tn_c = t_near[:, None]
        tf_c = t_far[:, None]
        o_c = rays_o[:, None, :]
        d_c = rays_d[:, None, :]

    blk_f = cand_blk.astype(jnp.float32)
    t_blk_mid = _timeline_at(blk_f * BLOCK_STEPS + BLOCK_STEPS / 2,
                             tn_c, rc)
    t_blk_lo = _timeline_at(blk_f * BLOCK_STEPS, tn_c, rc)
    t_blk_hi = _timeline_at((blk_f + 1) * BLOCK_STEPS, tn_c, rc)
    pos = o_c + d_c * t_blk_mid[..., None]
    u = contraction_lib.contract(pos, aabb, rc.contraction_type)
    # clamped query without the in-grid mask: conservative at the aabb
    # boundary (samples get the exact in-grid test in stage 2)
    cell, _ = occupancy.grid_index(
        jnp.clip(u, 0.0, 1.0 - 1e-7), rc.grid_resolution
    )
    blk_valid = (
        dilated[cell]
        & (t_blk_lo < tf_c)
        & (t_blk_hi > tn_c)
        & cand_active
    )
    # packed (ray, block) code; ray-major order is preserved by compaction
    blk_code = cand_ray * n_blocks + cand_blk
    blk_buf, num_blocks, blk_cut = _compact(
        blk_valid.reshape(-1), blk_code.reshape(-1), KB,
        fill=jnp.int32(R * n_blocks), return_cutoff=True,
    )  # (KB + 1,)
    first_bad_ray = jnp.minimum(first_bad_ray, blk_cut // n_blocks)

    # ---- stage 2: exact sample pass on surviving blocks ----------------
    blk_ray = jnp.minimum(blk_buf // n_blocks, R - 1)  # (KB+1,)
    blk_id = blk_buf % n_blocks
    blk_active = blk_buf < R * n_blocks
    step_k = (
        blk_id[:, None] * BLOCK_STEPS
        + jnp.arange(BLOCK_STEPS, dtype=jnp.int32)[None, :]
    )  # (KB+1, 8)
    tn_b = t_near[blk_ray][:, None]
    tf_b = t_far[blk_ray][:, None]
    t0 = _timeline_at(step_k.astype(jnp.float32), tn_b, rc)
    t1 = _timeline_at(step_k.astype(jnp.float32) + 1.0, tn_b, rc)
    t_mid = 0.5 * (t0 + t1)
    pos = rays_o[blk_ray][:, None, :] + rays_d[blk_ray][:, None, :] \
        * t_mid[..., None]
    u = contraction_lib.contract(pos, aabb, rc.contraction_type)
    occ = occupancy.query(
        occupancy.OccupancyGridState(occs=None, binary=binary),
        u, rc.grid_resolution,
    )
    sample_valid = (
        occ & (t_mid < tf_b) & (t_mid >= tn_b)
        & (step_k < S) & blk_active[:, None]
    )
    sample_code = blk_ray[:, None] * S + step_k  # (ray, step) packed
    code_buf, num_samples = _compact(
        sample_valid.reshape(-1), sample_code.reshape(-1), K,
        fill=jnp.int32(R * S),
    )  # (K + 1,)

    # ---- decode: t/dt analytic from (ray, step) codes ------------------
    ray_idx = jnp.where(code_buf < R * S, code_buf // S, R)
    step = (code_buf % S).astype(jnp.float32)
    safe_ray = jnp.minimum(ray_idx, R - 1)
    tn_s = t_near[safe_ray]
    s_t0 = _timeline_at(step, tn_s, rc)
    s_t1 = _timeline_at(step + 1.0, tn_s, rc)
    live = ray_idx < R
    t_buf = jnp.where(live, 0.5 * (s_t0 + s_t1), 0.0)
    dt_buf = jnp.where(live, s_t1 - s_t0, 0.0)

    # per-ray counts (colliding single-channel scatter-add: fast on TPU)
    counts = jnp.zeros((R,), jnp.int32).at[
        jnp.where(sample_valid.reshape(-1),
                  jnp.minimum(sample_code.reshape(-1) // S, R - 1), R)
    ].add(1, mode="drop")
    offsets = jnp.cumsum(counts) - counts
    return RaySamples(
        t_mid=t_buf, dt=dt_buf, ray_idx=ray_idx.astype(jnp.int32),
        counts=counts,
        offsets=offsets.astype(jnp.int32),
        num_samples=num_samples,
        num_blocks=num_blocks,
        num_superblocks=num_superblocks,
        coarse_complete=jnp.arange(R, dtype=jnp.int32) < first_bad_ray,
    )


_PRECISE_BLOCK = compensated.DEFAULT_BLOCK


def excl_segment_cumsum_precise(sdt, offsets, ray_idx, n_rays):
    """Per-ray EXCLUSIVE prefix sums over a flat ray-contiguous buffer,
    accurate to ~double precision in pure float32 (double-f32 two-sum).

    The plain f32 global cumsum reaches 1e5-1e7 at large sample budgets,
    where its ulp (0.01-1) dwarfs a single sample's optical depth — the
    round-2 training-collapse root cause. The earlier fix carried block
    bases in emulated float64, which FAULTS this TPU backend beyond ~1M
    elements; this version is float64-free:

      1. f32 cumsums within 32k blocks (values stay block-scale),
      2. a compensated (hi, lo) two-sum scan over the ~K/32k block
         totals — the only serial part, <=512 steps at 16M samples,
      3. the per-sample exclusive value minus its ray's segment base is
         assembled from BLOCK-LOCAL differences: rays span <=1024
         samples, so the hi-part difference crosses at most one block
         boundary and all rounding is relative to block-scale
         quantities, never the global sum.

    Args:
        sdt: (K1,) float32 per-sample values (ray-contiguous).
        offsets: (R,) int32 exclusive cumsum of per-ray counts.
        ray_idx: (K1,) int32 owning ray per sample (>= n_rays: inactive).
        n_rays: static int R.
    Returns:
        (K1,) float32: cumsum(sdt)[i] - sdt[i] - segment_base[ray(i)].
    """
    K1 = sdt.shape[0]
    B = _PRECISE_BLOCK
    flat_w, base_hi, base_lo = compensated.blocked_cumsum(sdt, B)
    blk = jnp.arange(K1, dtype=jnp.int32) // B
    safe_ray = jnp.clip(ray_idx, 0, n_rays - 1)

    idx = jnp.clip(offsets - 1, 0, K1 - 1)           # (R,)
    has = offsets > 0
    seg_w = jnp.where(has, flat_w[idx], 0.0)
    seg_b = jnp.where(has, idx // B, 0)
    seg_hi = jnp.where(has, base_hi[seg_b], 0.0)
    seg_lo = jnp.where(has, base_lo[seg_b], 0.0)

    d_hi = base_hi[blk] - seg_hi[safe_ray]
    d_lo = base_lo[blk] - seg_lo[safe_ray]
    local = (flat_w - sdt) - seg_w[safe_ray]
    s1, e1 = compensated.two_sum(d_hi, local)
    return s1 + (e1 + d_lo)


def _sigma_dt_alpha(sigma, samples, n_rays, rc):
    """Shared (slot_valid, clamped sigma*dt, alpha) — the prepass live
    mask MUST see the exact masking semantics composite applies, or the
    two would disagree at the early-stop boundary."""
    slot_valid = samples.ray_idx < n_rays
    sigma_dt = sigma * samples.dt * slot_valid
    # clamp per-sample optical depth: exp(-25) ~ 1.4e-11 is far below any
    # early_stop_eps (numerically invisible), and an overflowed density
    # (inf) would otherwise poison the global cumsum with inf - inf = NaN
    # — nerfacc's serial per-ray transmittance never forms that
    # difference, our segment-rebased global cumsum does
    sigma_dt = jnp.minimum(sigma_dt, 25.0)
    alpha = 1.0 - jnp.exp(-sigma_dt)
    if rc.alpha_thre > 0:
        keep = alpha >= rc.alpha_thre
        sigma_dt = sigma_dt * keep
        alpha = alpha * keep
    return slot_valid, sigma_dt, alpha


def occlusion_prepass(density_only_fn, samples, rays_o, rays_d, n_rays,
                      rc):
    """Early-termination compaction (see RenderConfig.prepass_budget).

    Stop-gradient density forward over all marched samples -> exclusive
    transmittance -> cut each ray's dead suffix -> stream-compact the
    survivors into a (prepass_budget + 1,) RaySamples buffer.

    Exactness: `trans_excl > eps` is a per-ray PREFIX (transmittance is
    monotone non-increasing along the ray), so culling removes only
    suffix samples whose weights — and whose weight cotangents w.r.t.
    every earlier sample — are identically zero under composite's own
    `live` mask. The main pass recomputes density on the survivors with
    the same params, so composite's mask agrees with the prepass.

    Returns (compacted RaySamples, live-sample demand count () int32 —
    may exceed prepass_budget; overflow drops tail samples and is
    surfaced as prepass_overflow_rate).
    """
    K2 = rc.prepass_budget
    safe_idx = jnp.clip(samples.ray_idx, 0, n_rays - 1)
    positions = rays_o[safe_idx] \
        + rays_d[safe_idx] * samples.t_mid[:, None]
    chunk = rc.field_chunk
    if chunk and chunk < positions.shape[0]:
        n = positions.shape[0]
        n_pad = -(-n // chunk) * chunk
        pos_p = jnp.concatenate(
            [positions, jnp.zeros((n_pad - n, 3), positions.dtype)]
        ).reshape(-1, chunk, 3)
        sigma = jax.lax.map(density_only_fn, pos_p).reshape(n_pad, -1)[:n]
    else:
        sigma = density_only_fn(positions)
    sigma = jax.lax.stop_gradient(sigma)[..., 0]

    slot_valid, sigma_dt, _ = _sigma_dt_alpha(sigma, samples, n_rays, rc)
    if os.environ.get("DENERF_NO_PRECISE_OPTICAL"):
        cum = jnp.cumsum(sigma_dt)
        K1 = sigma_dt.shape[0] - 1
        seg_base = jnp.where(
            samples.offsets > 0,
            cum[jnp.clip(samples.offsets - 1, 0, K1)],
            0.0,
        )
        optical = cum - sigma_dt - seg_base[safe_idx]
    else:
        optical = excl_segment_cumsum_precise(
            sigma_dt, samples.offsets, samples.ray_idx, n_rays
        )
    live = (jnp.exp(-optical) > rc.early_stop_eps) & slot_valid

    csum = jnp.cumsum(live.astype(jnp.int32))
    write_idx = jnp.where(live & (csum <= K2), csum - 1, K2 + 1)

    def put(payload, fill):
        return jnp.full(
            (K2 + 1,), fill, payload.dtype
        ).at[write_idx].set(payload, mode="drop", unique_indices=True)

    written = (live & (csum <= K2)).astype(jnp.int32)
    seg_ids = jnp.where(slot_valid, samples.ray_idx, n_rays)
    counts = jax.ops.segment_sum(
        written, seg_ids, num_segments=n_rays + 1
    )[:n_rays]
    # per-ray LIVE demand (pre-truncation): counts != live_counts marks
    # rays whose visible samples were dropped by the K2 budget — the
    # caller masks them out of the loss (a truncated ray renders with
    # missing mass, which is garbage supervision, not just noise)
    live_counts = jax.ops.segment_sum(
        live.astype(jnp.int32), seg_ids, num_segments=n_rays + 1
    )[:n_rays]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    compacted = RaySamples(
        t_mid=put(samples.t_mid, 0.0),
        dt=put(samples.dt, 0.0),
        ray_idx=put(samples.ray_idx, n_rays),
        counts=counts,
        offsets=offsets,
        # marched demand, NOT the live count: the dynamic-batch
        # controller must keep seeing true pre-cull demand
        num_samples=samples.num_samples,
        num_blocks=samples.num_blocks,
        num_superblocks=samples.num_superblocks,
        coarse_complete=samples.coarse_complete,
    )
    return compacted, csum[-1], live_counts


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
    # buffer capacity from the buffer itself: with an occlusion prepass
    # the compacted buffer is prepass_budget + 1, not sample_budget + 1
    K = samples.t_mid.shape[0] - 1
    slot_valid, sigma_dt, alpha = _sigma_dt_alpha(
        sigma, samples, n_rays, rc
    )
    safe_ray_idx = jnp.clip(samples.ray_idx, 0, n_rays - 1)

    def excl_optical_depth_f32(sdt):
        cum = jnp.cumsum(sdt)
        seg_base = jnp.where(
            samples.offsets > 0,
            cum[jnp.clip(samples.offsets - 1, 0, K)],
            0.0,
        )  # (R,)
        return cum - sdt - seg_base[safe_ray_idx]

    # VALUE through the double-f32 precise path, GRADIENT through the
    # plain float32 path: the global cumsum reaches ~1e5-1e7 at large
    # sample budgets, where float32 ulp (~0.01-1) injects noise of a
    # whole sample's optical depth into the per-ray differences; the
    # gradient (a reversed cumsum of small weight-scale cotangents) does
    # not suffer the same cancellation. The precise path is float64-free
    # (emulated f64 faults this backend's device beyond ~1M elements),
    # so it runs at EVERY buffer size — eval renders and the protocol
    # bench included.
    optical32 = excl_optical_depth_f32(sigma_dt)
    if not os.environ.get("DENERF_NO_PRECISE_OPTICAL"):
        optical_precise = excl_segment_cumsum_precise(
            jax.lax.stop_gradient(sigma_dt), samples.offsets,
            samples.ray_idx, n_rays,
        )
        optical = optical32 + jax.lax.stop_gradient(
            optical_precise - optical32
        )
    else:
        optical = optical32
    trans_excl = jnp.exp(-optical)
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
                render_bkgd=None, density_only_fn=None):
    """Full render: march -> [occlusion prepass] -> field eval on
    compacted samples -> composite.

    Args:
        field_fn: (positions (N,3), directions (N,3)) -> (rgb (N,ch),
            density (N,1)); typically a bound flax apply.
        binary: occupancy mask (grid_resolution**3,).
        rays_o, rays_d, ray_mask: (R, 3)/(R,) ray bundle.
        key: PRNG key (stratified jitter).
        rc: RenderConfig.
        render_bkgd: optional (ch,) learnable/fixed background radiance.
        density_only_fn: positions (N,3) -> density (N,1); required for
            the occlusion prepass (rc.prepass_budget).
    Returns:
        dict with radiance (R, ch), opacity (R,), depth (R,),
        num_rendering_samples (), num_marched_samples (), counts (R,),
        ray_complete (R,) bool (False when the sample budget or prepass
        buffer dropped any of the ray's live samples).
    """
    R = rays_o.shape[0]
    samples = march_rays(binary, rays_o, rays_d, ray_mask, key, rc)
    samples = jax.tree_util.tree_map(jax.lax.stop_gradient, samples)

    # per-ray completeness: the sample compaction keeps the first K valid
    # samples in ray order, so a ray is fully in the buffer iff its
    # demand segment [offset, offset + count) fits. Incomplete rays
    # render with missing mass — callers mask them out of the loss
    # (otherwise a budget overflow silently rewards empty renders, the
    # round-1 truncation-collapse failure mode)
    ray_complete = (
        samples.offsets + samples.counts <= rc.sample_budget
    )
    if samples.coarse_complete is not None:
        # counts UNDERCOUNT demand for rays whose blocks were dropped at
        # the coarse stages, so the budget-fit test alone is blind to
        # block/superblock truncation
        ray_complete &= samples.coarse_complete

    prepass_demand = None
    if (rc.prepass_div and density_only_fn is not None
            and rc.early_stop_eps > 0):
        samples, prepass_demand, live_counts = occlusion_prepass(
            density_only_fn, samples, rays_o, rays_d, R, rc
        )
        ray_complete &= samples.counts == live_counts

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
        # remat per chunk, but SAVE the named hash-encode output
        # (fields.py tags it "hash_encode_out"): the table gather is by
        # far the most expensive op in the step, and the plain
        # jax.checkpoint re-ran it in every backward chunk — ~2x the
        # dominant cost for activation memory the encode features don't
        # need (chunk x 32 x f32 = 256 MB per 2M-sample chunk)
        ckpt_field = jax.checkpoint(
            field_fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "hash_encode_out"
            ),
        )
        rgb, density = jax.lax.map(
            lambda pd: ckpt_field(pd[0], pd[1]), (pos_p, dir_p)
        )
        rgb = rgb.reshape(n_pad, -1)[:n]
        density = density.reshape(n_pad, -1)[:n]
    else:
        rgb, density = field_fn(positions, directions)

    colors, opacities, depths, num_rendering_samples = composite(
        density[..., 0], rgb, samples, R, rc, render_bkgd
    )
    KB = rc.block_budget or max(rc.sample_budget // 4, 1)
    out = {
        "radiance": colors,
        "opacity": opacities,
        "depth": depths / (opacities + rc.opacity_eps),
        "num_rendering_samples": num_rendering_samples,
        "num_marched_samples": samples.num_samples,
        "counts": samples.counts,
        "ray_complete": ray_complete,
        # coarse-stage compaction demand / capacity: > 1.0 means whole
        # ray segments were silently truncated BEFORE the sample stage
        # (invisible to sample_overflow_rate) — the visibility signal
        # the block/superblock buffers need
        "block_overflow_rate": (
            samples.num_blocks.astype(jnp.float32) / KB
            if samples.num_blocks is not None else jnp.float32(0.0)
        ),
        "superblock_overflow_rate": (
            samples.num_superblocks.astype(jnp.float32)
            / max(KB // 2, 1)
            if samples.num_superblocks is not None else jnp.float32(0.0)
        ),
        # live-sample demand / prepass capacity: > 1.0 means surviving
        # (visible) samples were dropped from ray tails
        "prepass_overflow_rate": (
            prepass_demand.astype(jnp.float32) / rc.prepass_budget
            if prepass_demand is not None else jnp.float32(0.0)
        ),
    }
    return out
