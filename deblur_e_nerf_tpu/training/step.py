"""The jit-compiled training step: event physics -> renders -> loss -> update.

TPU-native redesign of the reference's `DeblurENeRF.training_step`
(reference: deblur_e_nerf/models/deblur_e_nerf.py:396-586) as ONE pure
function compiled once:

  - The reference's host-side normalized samplers (data/datamodule.py:151-213)
    become on-device PRNG draws (float64) from the step key.
  - The reference's stateful diff-amp reset (pixel_bandwidth.py:419-423) is
    threaded functionally: the diff.start render (reset_diff=True) produces
    the ResetState consumed by the other three renders of the same step.
  - The reference's dynamic batch size (deblur_e_nerf.py:1252-1308) becomes a
    fixed-capacity event batch with an active-prefix mask: the host chooses
    the active count from the psum'd samples-per-ray EMA; shapes never
    change, so the step compiles exactly once.
  - Timestamps are SPLIT: exact int64 ns bases + small float32
    differentiable deltas (learnable refractory shift, sampled interval
    offsets), renormalized with a straight-through round before use. The
    reference's float64 timestamp math is unusable on TPU — the backend's
    emulated f64 multiply is only f32-accurate (~1.5e-5), tens of
    microseconds at second-scale timelines.

Batch layout (all arrays capacity N = batch_capacity, prefix-active):
  position (N, 2) f32, start_ts (N,) i64, end_ts (N,) i64,
  num_pos (N,) f32, num_neg (N,) f32, channel_idx (N,) i32, valid (N,) bool
"""

import functools
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import (contraction as contraction_lib, event_gen,
                      nerf_model, occupancy as occupancy_lib,
                      pixel_bandwidth, trajectory as trajectory_lib)
from ..ops import samplers
from . import loss as loss_lib


class StaticConfig(NamedTuple):
    """Hashable static configuration of the training step."""
    pixel_bandwidth_enabled: bool
    it_sample_size: int           # S
    has_bayer: bool
    min_modeled_intensity: float
    loss_weight_diff: float
    loss_weight_tv: float
    loss_error_fn_diff: str
    loss_error_fn_tv: str
    loss_normalize_diff: bool
    loss_normalize_tv: bool
    # density sparsity prior ("fog loss", loss.weight.density_sparsity):
    # L1 on per-step opacity at uniform aabb points. Event supervision
    # only constrains log-intensity DIFFERENCES along observed rays, so a
    # global density pedestal (fog) is loss-invisible — but it saturates
    # the occupancy grid, exploding samples/ray and starving the event
    # batch (measured round 3: occ rate -> 1.0, 290 samples/ray, batch
    # 256 -> 7 events/step, PSNR decaying to the flat-field level).
    loss_weight_sparsity: float = 0.0
    sparsity_samples: int = 4096
    # fraction of sparsity samples targeted at currently-occupied cells
    # (the rest are uniform over the aabb); 0.0 reproduces the
    # uniform-only prior of the round-3 blur30_v2 probe
    sparsity_targeted_fraction: float = 0.5


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    occ_state: Any
    step: jnp.ndarray  # () int32


def derive_intervals(start_base, start_delta, end_base, normalized,
                     weight_diff, weight_tv):
    """Supervision interval derivation
    (reference: deblur_e_nerf.py:419-455).

    Timestamps are split (int64 base, float32 delta): all interval
    endpoints share the event's int64 `start_base`, and the sampled
    positions live in the float32 delta (relative quantities — exact
    int64 differences cast to f32 — so device f32 math is precise; the
    TPU backend's f64 multiply is only f32-accurate).

    Returns (diff, subdiff) dicts with keys ts_diff (f32 ns length) and
    start/end deltas relative to `start_base`.
    """
    gap = jnp.maximum(
        (end_base - start_base).astype(jnp.float32) - start_delta, 0.0
    )
    diff = None
    if weight_diff > 0:
        ts_diff = gap * normalized["ts_diff"]
        start = start_delta + normalized["diff_start_ts"] \
            * jnp.maximum(gap - ts_diff, 0.0)
        end = jnp.minimum(start + ts_diff, start_delta + gap)
        diff = {"ts_diff": ts_diff, "start_delta": start,
                "end_delta": end}
        tv_start, tv_end = start, end
    else:
        tv_start, tv_end = start_delta, start_delta + gap

    subdiff = None
    if weight_tv > 0:
        ts_sub = (tv_end - tv_start) * normalized["ts_subdiff"]
        start = tv_start + normalized["subdiff_start_ts"] * (
            jnp.maximum(tv_end - ts_sub, tv_start) - tv_start
        )
        end = jnp.minimum(start + ts_sub, tv_end)
        subdiff = {"ts_diff": ts_sub, "start_delta": start,
                   "end_delta": end}
    return diff, subdiff


def draw_normalized_samples(key, n, sc):
    """On-device analog of the reference's normalized sampler bank
    (reference: data/datamodule.py:151-213): ts_diff ~ dirac(1),
    diff_start_ts ~ U[0,1], ts_subdiff ~ triangular(mode 0),
    subdiff_start_ts ~ U[0,1], interval_gen ~ dirac(0.5)."""
    k1, k2 = jax.random.split(key)
    normalized = {
        "ts_diff": samplers.dirac_delta((n,), 1.0),
        "diff_start_ts": samplers.uniform(k1, (n,)),
        "ts_subdiff": samplers.triangular(k2, (n,), mode=0.0),
        "subdiff_start_ts": samplers.uniform(
            jax.random.fold_in(k1, 1), (n,)
        ),
    }
    if sc.pixel_bandwidth_enabled:
        normalized["interval_gen"] = samplers.dirac_delta(
            (sc.it_sample_size - 1, n), 0.5
        )
    return normalized


def make_render_train_pixels(model, params, consts, occ_state, sc, key,
                             level_mask=None):
    """Build the (timestamps -> intensity, stats) sampling closure
    (reference: deblur_e_nerf.py:1162-1183 render_train_pixels)."""
    traj = consts["trajectory"]
    intrinsics_inv = consts["train_intrinsics_inv"]

    def render_train_pixels(ts, ts_delta, pixel_position, channel_idx,
                            valid, render_key):
        # ts: ([S,] N) int64 ns base; ts_delta f32 differentiable offset
        batch_shape = ts.shape
        pos, orient = trajectory_lib.interpolate_pose(traj, ts, ts_delta)
        pixel = jnp.broadcast_to(
            pixel_position, (*batch_shape, 2)
        ).astype(jnp.float32)
        rays_o, rays_d = nerf_model.pixel_params_to_ray(
            intrinsics_inv.astype(jnp.float32), pixel, pos, orient
        )
        flat_o = rays_o.reshape(-1, 3)
        flat_d = rays_d.reshape(-1, 3)
        mask = jnp.broadcast_to(valid, batch_shape).reshape(-1)
        out = nerf_model.render(
            model, params["nerf"], occ_state, flat_o, flat_d, mask,
            render_key, level_mask=level_mask,
        )
        radiance = out["radiance"].reshape(
            *batch_shape, -1
        )  # ([S,] N, ch)
        opacity = out["opacity"].reshape(batch_shape)
        intensity = radiance + sc.min_modeled_intensity
        if sc.has_bayer:
            ch = jnp.broadcast_to(channel_idx, batch_shape)
            intensity = jnp.take_along_axis(
                intensity, ch[..., None].astype(jnp.int32), axis=-1
            )[..., 0]
        else:
            intensity = intensity[..., 0]
        if model.render_bkgd_mode is None:
            is_valid = opacity > 0
        else:
            is_valid = jnp.ones_like(opacity, bool)
        # buffer-truncated rays render with missing mass — garbage, not
        # noise; they leave the loss via a SEPARATE flag (is_valid is
        # any-reduced across blur samples, completeness must all-reduce)
        complete = out["ray_complete"].reshape(batch_shape)
        stats = {
            "mean_ray_occ_rate": loss_lib.masked_mean(
                (opacity > 0).astype(jnp.float32),
                jnp.broadcast_to(valid, batch_shape),
            ),
            "ray_truncation_rate": loss_lib.masked_mean(
                (~complete).astype(jnp.float32),
                jnp.broadcast_to(valid, batch_shape),
            ),
            "num_rendering_samples": out["num_rendering_samples"],
            # PRE-budget marched-sample demand: the dynamic-batch-size
            # signal MUST see true demand, not the truncated count —
            # otherwise overflow makes samples/ray read low, the batch
            # stays too big, and most rays render empty (a training
            # collapse, not just a perf bug)
            "num_marched_samples": out["num_marched_samples"],
            "block_overflow_rate": out["block_overflow_rate"],
            "superblock_overflow_rate": out["superblock_overflow_rate"],
            "prepass_overflow_rate": out["prepass_overflow_rate"],
            "num_rays": jnp.sum(valid) * (
                batch_shape[0] if len(batch_shape) == 2 else 1
            ),
        }
        return intensity, stats, is_valid, complete

    return render_train_pixels


def compute_loss(model, params, consts, occ_state, batch, key, sc,
                 loss_config, level_mask=None):
    """Forward pass producing (scalar loss, metrics dict).

    The reference issues four sequential renders per step (diff start/end,
    subdiff start/end; reference: deblur_e_nerf.py:472-526). The renders
    are independent — only the differencing-amp reset correction couples
    them, and it is an elementwise epilogue — so all interval-endpoint
    timestamps are batched into ONE render of R*N events: 4x larger
    batched matmuls on the MXU and a 4x smaller compiled program.
    """
    valid = batch["valid"]
    n = valid.shape[0]
    k_norm, k_render = jax.random.split(key)
    normalized = draw_normalized_samples(k_norm, n, sc)

    log_intensity_diff = event_gen.apply_contrast_threshold(
        params["contrast_threshold"], consts["contrast_threshold"],
        batch["num_pos"].astype(jnp.float32),
        batch["num_neg"].astype(jnp.float32),
    )
    # split timestamps: exact int64 bases, learnable/sampled offsets in a
    # float32 delta (the refractory shift tau is differentiable)
    start_base = batch["start_ts"]
    end_base = batch["end_ts"]
    tau = event_gen.refractory_period(
        params["refractory_period"], consts["refractory_period"]
    ).astype(jnp.float32)
    start_delta = jnp.broadcast_to(tau, start_base.shape)
    event = {
        "log_intensity_diff": log_intensity_diff,
        # effective supervision interval length (end - (start + tau))
        "dt": jnp.maximum(
            (end_base - start_base).astype(jnp.float32) - tau, 1e-6
        ),
    }

    diff, subdiff = derive_intervals(
        start_base, start_delta, end_base, normalized,
        sc.loss_weight_diff, sc.loss_weight_tv,
    )

    # one batched render over all interval endpoints; all endpoint deltas
    # are relative to the event's start_base
    delta_slices = []
    if diff is not None:
        delta_slices += [diff["start_delta"], diff["end_delta"]]
    if subdiff is not None:
        delta_slices += [subdiff["start_delta"], subdiff["end_delta"]]
    R = len(delta_slices)
    ts_all, delta_all = pixel_bandwidth.split_time(
        jnp.tile(start_base, R), jnp.concatenate(delta_slices)
    )
    pixel_all = jnp.tile(batch["position"], (R, 1))
    channel_idx = batch.get("channel_idx")
    channel_all = None if channel_idx is None \
        else jnp.tile(channel_idx, R)
    valid_all = jnp.tile(valid, R)

    render_train_pixels = make_render_train_pixels(
        model, params, consts, occ_state, sc, k_render,
        level_mask=level_mask,
    )
    if sc.pixel_bandwidth_enabled:
        interval_gen_all = jnp.tile(normalized["interval_gen"], (1, R))

        def sampling_fn(sample_ts, sample_ts_delta):
            return render_train_pixels(
                sample_ts, sample_ts_delta, pixel_all, channel_all,
                valid_all, k_render,
            )

        log_it_all, aux, _ = pixel_bandwidth.forward_fused(
            params["pixel_bandwidth"], consts["pixel_bandwidth"],
            interval_gen_all, ts_all, delta_all, sampling_fn, n,
        )
        stats, is_valid_s, complete_s = aux
        is_valid_all = jnp.any(is_valid_s, axis=0)
        # ALL blur samples must be complete: the filtered log intensity
        # integrates every sample, so one truncated render corrupts it
        complete_all = jnp.all(complete_s, axis=0)
    else:
        intensity, stats, is_valid_all, complete_all = \
            render_train_pixels(
                ts_all, delta_all, pixel_all, channel_all, valid_all,
                k_render,
            )
        log_it_all = jnp.log(intensity)

    outs = log_it_all.reshape(R, n)
    valids = is_valid_all.reshape(R, n)
    completes = complete_all.reshape(R, n)
    i = 0
    if diff is not None:
        diff["log_intensity_diff"] = outs[i + 1] - outs[i]
        diff["is_valid"] = (valids[i] | valids[i + 1]) & valid \
            & completes[i] & completes[i + 1]
        i += 2
    if subdiff is not None:
        subdiff["log_intensity_diff"] = outs[i + 1] - outs[i]
        subdiff["is_valid"] = (valids[i] | valids[i + 1]) & valid \
            & completes[i] & completes[i + 1]

    _, _, mean_ct = event_gen.contrast_thresholds(
        params["contrast_threshold"], consts["contrast_threshold"]
    )
    mean_losses = loss_lib.compute(
        loss_config, event, diff, subdiff, mean_ct
    )
    weights = {
        "log_intensity_diff": sc.loss_weight_diff,
        "log_intensity_tv": sc.loss_weight_tv,
    }
    total = sum(
        v * weights[name] for name, v in mean_losses.items()
    )
    # NOTE: fine-table decay (model.table_decay) is applied as DECOUPLED
    # weight decay in the optimizer (optim._table_row_decay) — as a loss
    # term its gradient is normalized away by Adam (measured round 3: the
    # decay/no-decay PSNR curves agreed to 1e-6).
    if sc.loss_weight_sparsity > 0.0:
        # fog loss (see StaticConfig.loss_weight_sparsity): mean per-step
        # opacity 1 - exp(-sigma * render_step_size) at uniform aabb
        # points. The exp saturates for opaque surface samples, so the
        # pressure is ~linear on sub-threshold fog and vanishing on real
        # geometry; under Adam the weak-but-consistent gradient dominates
        # the zero-mean event-noise gradients that grow the fog.
        k_cells, k_occ, k_jitter = jax.random.split(
            jax.random.fold_in(key, 0x5FA), 3
        )
        rc = model.render_config
        aabb = jnp.asarray(rc.aabb, jnp.float32)
        # `sparsity_targeted_fraction` of the points targeted at
        # currently-OCCUPIED cells (inverse-CDF over the binary grid),
        # the rest uniform over the aabb. Targeting rationale: the occ
        # grid's EMA-max latches any fog cell whose max sample crosses
        # occ_thre, so pressuring exactly those cells unlatches them
        # instead of waiting for diffuse uniform coverage (measured
        # round 3: uniform-only lambda=0.01 left occ-rate bursts to 1.0
        # every ~400 steps, each collapsing the event batch 256 -> ~8).
        n_tgt = int(round(sc.sparsity_samples
                          * sc.sparsity_targeted_fraction))
        n_uni = sc.sparsity_samples - n_tgt
        parts = []
        if n_uni > 0:
            parts.append(jax.random.randint(
                k_cells, (n_uni,), 0, occ_state.binary.shape[0],
                dtype=jnp.int32,
            ))
        if n_tgt > 0:
            parts.append(occupancy_lib.sample_occupied_cells(
                k_occ, occ_state, n_tgt
            ))
        cells = jnp.concatenate(parts)
        res = rc.grid_resolution
        coords = occupancy_lib.cell_coords(res)[cells]
        jitter = jax.random.uniform(
            k_jitter, coords.shape, dtype=jnp.float32
        )
        u = (coords.astype(jnp.float32) + jitter) / res
        x = contraction_lib.contract_inv(u, aabb, rc.contraction_type)
        sigma = nerf_model.density_fn(
            model, params["nerf"], x, level_mask
        )
        sparsity = jnp.mean(
            1.0 - jnp.exp(-sigma[..., 0] * rc.render_step_size)
        )
        total = total + sc.loss_weight_sparsity * sparsity
        mean_losses = dict(mean_losses, density_sparsity=sparsity)

    metrics = {
        "loss": total,
        **{f"loss_{k}": v for k, v in mean_losses.items()},
        "mean_num_samples_per_ray": (
            stats["num_marched_samples"].astype(jnp.float32)
            / jnp.maximum(stats["num_rays"], 1).astype(jnp.float32)
        ),
        "sample_overflow_rate": (
            stats["num_marched_samples"].astype(jnp.float32)
            / float(model.render_config.sample_budget)
        ),
        "block_overflow_rate": stats["block_overflow_rate"],
        "superblock_overflow_rate": stats["superblock_overflow_rate"],
        "prepass_overflow_rate": stats["prepass_overflow_rate"],
        "mean_ray_occ_rate": stats["mean_ray_occ_rate"],
        "ray_truncation_rate": stats["ray_truncation_rate"],
        "mean_valid_rate": loss_lib.masked_mean(
            ((diff or subdiff)["is_valid"]).astype(jnp.float32), valid
        ),
        "batch_size": jnp.sum(valid),
    }
    if os.environ.get("DENERF_DEBUG_NANS"):
        # forward-side NaN localization: pixel_bandwidth dbg_ stats
        # pass-through + non-finite render-output counts per slice
        metrics.update(
            {k: v for k, v in stats.items() if k.startswith("dbg_")}
        )
        metrics["dbg_nonfinite_out"] = jnp.sum(
            ~jnp.isfinite(outs)).astype(jnp.float32)
        for j, name in enumerate(
                ["diff_s", "diff_e", "sub_s", "sub_e"][:R]):
            metrics[f"dbg_nonfinite_{name}"] = jnp.sum(
                ~jnp.isfinite(outs[j]) & valid).astype(jnp.float32)
    return total, metrics


def make_train_step(model, consts, tx, sc, loss_config,
                    trainable_mask=None):
    """Build the jitted train step closure.

    Args:
        trainable_mask: optional pytree of bools matching params; leaves
            marked False are stop-gradiented inside the loss so XLA prunes
            their backward entirely (the optimizer's freeze mask alone
            still *computes* the dead gradients).
    Returns step_fn(state: TrainState, batch, key) -> (TrainState, metrics).
    """

    def step_fn(state, batch, key):
        # coarse-to-fine grid-level curriculum (None without curriculum
        # config; the mask is a function of the traced step counter)
        level_mask = nerf_model.level_mask_for_step(model, state.step)

        def loss_fn(params):
            if trainable_mask is not None:
                params = jax.tree_util.tree_map(
                    lambda p, t: p if t else jax.lax.stop_gradient(p),
                    params, trainable_mask,
                )
            return compute_loss(
                model, params, consts, state.occ_state, batch, key, sc,
                loss_config, level_mask=level_mask,
            )

        (loss_value, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if os.environ.get("DENERF_DEBUG_GRADS"):
            # trace-time debug flag: per-parameter-group gradient
            # max-abs + non-finite counts (pinpoints which family
            # explodes first when hunting platform-specific NaNs)
            for group, g in grads.items():
                leaves = jax.tree_util.tree_leaves(g)
                if not leaves:
                    continue
                metrics[f"gmax_{group}"] = jnp.max(jnp.asarray(
                    [jnp.max(jnp.abs(l)) for l in leaves]
                ))
                metrics[f"gnan_{group}"] = sum(
                    jnp.sum(~jnp.isfinite(l)) for l in leaves
                ).astype(jnp.float32)
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        # projection: keep the refractory logit in its non-vanishing-
        # gradient band (reference clamps in-place on every access)
        new_params = dict(new_params)
        new_params["refractory_period"] = (
            event_gen.clamp_refractory_logit(
                new_params["refractory_period"],
                consts["refractory_period"],
            )
        )
        new_state = TrainState(
            params=new_params, opt_state=new_opt_state,
            occ_state=state.occ_state, step=state.step + 1,
        )
        return new_state, metrics

    return step_fn
