"""Evaluation: full-image rendering + log-affine / offset-gamma correction
+ metrics + artifacts.

Analog of the reference's evaluation_step / evaluation_epoch_end
(reference: deblur_e_nerf/models/deblur_e_nerf.py:602-1053). Device work is
the chunked image render; everything downstream (float64 least-squares
affine correction, GN/LM black-level refinement, metrics, artifact dumps)
runs host-side in numpy exactly like the reference's `.cpu()` move
(deblur_e_nerf.py:713-717).
"""

import dataclasses
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import posed_images as posed_images_data
from ..models import nerf_model, offset_gamma
from . import metrics as metrics_lib

CORRECTION_ERRORS_FOLDER_NAME = "correction-errors"
PREDICTIONS_FOLDER_NAME = "predictions"
PREDICTION_BIT_DEPTH = 8


def make_render_image_fn(model, eval_sample_budget=None,
                         field_chunk=1 << 20, eval_prepass_div=None):
    """Build a jitted chunked full-image renderer.

    Returns render_image(params, occ_state, intrinsics_inv,
    pixel_pos (H, W, 2), T_wc_position (3,), T_wc_orientation (3, 3))
    -> intensity image ([C,] H, W) float32 (min_modeled_intensity NOT
    added — the caller owns that, reference: deblur_e_nerf.py:1201-1203).

    `eval_prepass_div` (config key model.nerf.eval_occlusion_prepass_div;
    default off) enables the occlusion prepass for eval renders: the
    march keeps the worst-case chunk x S_max budget (never truncates),
    while the field eval pays only live samples — exact semantics
    (dead-suffix culling at early_stop_eps, same as nerfacc's in-loop
    early termination) at a fraction of the cost on converged scenes.
    If live demand ever exceeds budget/div the affected rays are
    reported via the truncation warning below rather than silently
    rendered with missing mass.
    """
    chunk = model.test_chunk_size
    rc = dataclasses.replace(
        model.render_config,
        stratified=False,
        # worst-case budget: every ray at max samples — eval images must
        # never silently truncate (field eval is remat-chunked anyway)
        sample_budget=(eval_sample_budget
                       or chunk * model.render_config.max_samples_per_ray),
        block_budget=None,
        field_chunk=field_chunk,
        prepass_div=(model.render_config.prepass_div
                     if eval_prepass_div is None
                     else int(eval_prepass_div)),
    )
    eval_model = model._replace(render_config=rc)

    @jax.jit
    def render_chunk(params, occ_state, rays_o, rays_d, mask):
        return nerf_model.render(
            eval_model, params, occ_state, rays_o, rays_d, mask,
            jax.random.PRNGKey(0),
        )

    def render_image(params, occ_state, intrinsics_inv, pixel_pos,
                     T_wc_position, T_wc_orientation):
        H, W = pixel_pos.shape[:2]
        flat_pix = pixel_pos.reshape(-1, 2).astype(jnp.float32)
        pos = jnp.broadcast_to(T_wc_position, (H * W, 3))
        orient = jnp.broadcast_to(T_wc_orientation, (H * W, 3, 3))
        rays_o, rays_d = nerf_model.pixel_params_to_ray(
            intrinsics_inv.astype(jnp.float32), flat_pix, pos, orient
        )
        n = H * W
        n_pad = -(-n // chunk) * chunk
        pad = n_pad - n
        if pad:
            rays_o = jnp.concatenate(
                [rays_o, jnp.zeros((pad, 3), jnp.float32)]
            )
            rays_d = jnp.concatenate(
                [rays_d, jnp.ones((pad, 3), jnp.float32)]
            )
        mask = jnp.arange(n_pad) < n
        outs = []
        n_truncated = 0
        for i in range(0, n_pad, chunk):
            out = render_chunk(
                params, occ_state, rays_o[i:i + chunk],
                rays_d[i:i + chunk], mask[i:i + chunk],
            )
            outs.append(out["radiance"])
            if rc.prepass_div:
                n_truncated += int(jnp.sum(
                    ~out["ray_complete"] & mask[i:i + chunk]
                ))
        if n_truncated:
            print(f"WARNING: eval prepass truncated {n_truncated} rays "
                  f"(live demand exceeded sample_budget/"
                  f"{rc.prepass_div}); raise the budget or lower "
                  "eval_occlusion_prepass_div", flush=True)
        radiance = jnp.concatenate(outs)[:n]  # (H*W, C)
        img = radiance.reshape(H, W, -1)
        if img.shape[-1] == 1:
            return img[..., 0]  # (H, W)
        return jnp.moveaxis(img, -1, 0)  # (C, H, W)

    return render_image


def affine_log_correction(pred_log, target_log,
                          is_eff_per_channel_log_it_scale):
    """Least-squares affine correction of log intensities in float64
    (reference: deblur_e_nerf.py:742-816).

    Args:
        pred_log, target_log: (B, C, H, W) float64.
    Returns:
        corrected_pred_log (B, C, H, W), intensity_gamma (1/C,),
        intensity_scale (1/C,)
    """
    B, C, H, W = pred_log.shape
    if is_eff_per_channel_log_it_scale:
        X = pred_log.transpose(1, 0, 2, 3).reshape(C, -1)  # (C, BHW)
        Y = target_log.transpose(1, 0, 2, 3).reshape(C, -1)
        corrected = np.empty_like(X)
        gamma = np.empty(C)
        scale = np.empty(C)
        for c in range(C):
            A = np.stack([X[c], np.ones_like(X[c])], axis=1)
            beta, *_ = np.linalg.lstsq(A, Y[c], rcond=None)
            corrected[c] = A @ beta
            gamma[c] = beta[0]
            scale[c] = np.exp(beta[1])
        corrected = corrected.reshape(C, B, H, W).transpose(1, 0, 2, 3)
        return corrected, gamma, scale
    # shared gamma, per-channel offsets (reference: lines 760-766)
    N = B * H * W
    X = np.zeros((C * N, 1 + C))
    x_flat = pred_log.transpose(1, 0, 2, 3).reshape(C, N)
    y_flat = target_log.transpose(1, 0, 2, 3).reshape(C, N)
    for c in range(C):
        X[c * N:(c + 1) * N, 0] = x_flat[c]
        X[c * N:(c + 1) * N, 1 + c] = 1.0
    beta, *_ = np.linalg.lstsq(
        X, y_flat.reshape(-1), rcond=None
    )
    corrected = (X @ beta).reshape(C, B, H, W).transpose(1, 0, 2, 3)
    gamma = beta[:1]
    scale = np.exp(beta[1:])
    return corrected, gamma, scale


class Evaluator:
    """Carries warm-started correction parameters across eval epochs
    (reference: deblur_e_nerf.py:907-916)."""

    def __init__(self, correction_config, has_bayer, log_dir=None,
                 save_pred_intensity_img=False):
        self.config = correction_config
        self.has_bayer = has_bayer
        self.log_dir = log_dir
        self.save_pred = save_pred_intensity_img
        radiance_dim = 3 if has_bayer else 1
        self.is_eff_per_channel = (
            not has_bayer or bool(correction_config.per_channel_log_it_scale)
        )
        c = radiance_dim if self.is_eff_per_channel else 1
        self.init_scale = np.ones((radiance_dim, 1, 1, 1), np.float64)
        self.init_gamma = np.ones((c, 1, 1, 1), np.float64)
        self.init_offset = np.zeros((radiance_dim, 1, 1, 1), np.float64)

    def epoch_end(self, outputs, min_normalized_pixel_value,
                  max_normalized_pixel_value, epoch=0,
                  sanity_checking=False, lpips_net="alex",
                  lpips_weights_path=None, writer=None,
                  stage="val", global_step=0):
        """Full epoch-end pipeline; `outputs` is a list of dicts with
        sample_id, pred_intensity_img, target_intensity_img,
        exposure_time, gain (host numpy). Returns metrics dict."""
        sample_ids = [
            posed_images_data.sample_id_to_str(o["sample_id"])
            for o in outputs
        ]
        pred = np.stack(
            [np.asarray(o["pred_intensity_img"], np.float64)
             for o in outputs]
        )
        target = np.stack(
            [np.asarray(o["target_intensity_img"], np.float64)
             for o in outputs]
        )
        exposure = np.asarray(
            [float(o.get("exposure_time", 1)) for o in outputs]
        )
        gain = np.asarray([float(o.get("gain", 1.0)) for o in outputs])

        if pred.ndim == 3:  # monochrome -> (B, 1, H, W)
            pred = pred[:, None]
            target = target[:, None]
        B, C, H, W = pred.shape

        gep = (gain * exposure).reshape(B, 1, 1, 1)
        normalized_gep = gep / gep.mean()
        log_gep = np.log(normalized_gep)

        pred_log = np.log(pred)
        target_log = np.log(target) - log_gep

        corrected_log, gamma, scale = affine_log_correction(
            pred_log, target_log, self.is_eff_per_channel
        )

        if not self.config.black_level_offset:
            pred_img = np.exp(corrected_log + log_gep)
            target_img = np.exp(target_log + log_gep)
        else:
            pred_int = np.exp(corrected_log)[..., None]  # (B,C,H,W,1)
            target_int = target[..., None]
            correction = offset_gamma.OffsetGammaCorrection(
                normalized_gep[..., None], self.init_scale,
                self.init_gamma, self.init_offset,
            )
            errors = offset_gamma.optimize(
                correction, pred_int, target_int,
                algo=self.config.optimizer.algo,
                max_steps=int(self.config.optimizer.max_steps),
            )
            if not sanity_checking:
                self.init_scale = correction.scale.copy()
                self.init_gamma = correction.gamma.copy()
                self.init_offset = correction.offset.copy()
            scale = (
                scale ** correction.gamma[:, 0, 0, 0]
                * correction.scale[:, 0, 0, 0]
            )
            gamma = gamma * correction.gamma[:, 0, 0, 0]
            pred_img = correction(pred_int)[..., 0]
            target_img = target
            if self.log_dir is not None:
                folder = os.path.join(
                    self.log_dir, CORRECTION_ERRORS_FOLDER_NAME
                )
                os.makedirs(folder, exist_ok=True)
                np.savetxt(
                    os.path.join(folder, f"{epoch}.csv"), errors,
                    fmt="%.14f",
                )

        per_image = [
            metrics_lib.compute_all(
                pred_img[i], target_img[i],
                min_normalized_pixel_value, max_normalized_pixel_value,
                lpips_net, lpips_weights_path,
            )
            for i in range(B)
        ]
        metric = {
            k: float(np.mean([m[k] for m in per_image]))
            for k in per_image[0]
        }

        if writer is not None:
            # TensorBoard image logs: predictions every eval epoch,
            # targets once (reference: deblur_e_nerf.py:985-1005)
            rng = max_normalized_pixel_value - min_normalized_pixel_value
            for sid, img in zip(sample_ids, pred_img):
                writer.add_image(
                    f"{stage}/pred/{sid}",
                    np.clip((img - min_normalized_pixel_value) / rng,
                            0, 1),
                    global_step,
                )
            if epoch == 0:
                for sid, img in zip(sample_ids, target_img):
                    writer.add_image(
                        f"{stage}/target/{sid}",
                        np.clip(
                            (img - min_normalized_pixel_value) / rng,
                            0, 1,
                        ),
                        global_step,
                    )

        if self.save_pred and self.log_dir is not None:
            self._save_predictions(
                sample_ids, pred_img, min_normalized_pixel_value,
                max_normalized_pixel_value,
            )
        return metric

    def _save_predictions(self, sample_ids, pred_img, min_val, max_val):
        import cv2
        folder = os.path.join(self.log_dir, PREDICTIONS_FOLDER_NAME)
        os.makedirs(folder, exist_ok=True)
        max_pixel = 2 ** PREDICTION_BIT_DEPTH - 1
        norm = np.clip(
            (pred_img - min_val) / (max_val - min_val), 0, 1
        )
        quantized = np.round(max_pixel * norm).astype(np.uint8)
        imgs = quantized.transpose(0, 2, 3, 1)  # (B, H, W, C)
        for sid, img in zip(sample_ids, imgs):
            if img.shape[-1] == 3:
                img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(folder, sid + ".png"), img)
