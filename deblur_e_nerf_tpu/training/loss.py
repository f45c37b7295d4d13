"""Training losses: log-intensity difference + temporal total variation.

Functional analog of the reference Loss module
(reference: deblur_e_nerf/loss_metric/loss.py:6-96). Masked means replace
boolean indexing (dynamic shapes) — numerically identical for non-empty
masks, and NaN-free for empty ones.
"""

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

LOSS_NAMES = ("log_intensity_diff", "log_intensity_tv")
_MAPE_EPS = float(np.finfo(np.float64).eps)


def l1(pred, target):
    return jnp.abs(pred - target)


def mse(pred, target):
    return jnp.square(pred - target)


def huber(pred, target, delta=1.0):
    err = jnp.abs(pred - target)
    quad = 0.5 * jnp.square(err)
    lin = delta * (err - 0.5 * delta)
    return jnp.where(err <= delta, quad, lin)


def mape(pred, target):
    """Mean-absolute-percentage error
    (reference: deblur_e_nerf/utils/modules.py:97-122)."""
    return jnp.abs(pred - target) \
        / jnp.maximum(jnp.abs(target), _MAPE_EPS)


ERROR_FNS: Dict[str, Callable] = {
    "l1": l1, "mse": mse, "huber": huber, "mape": mape,
}


def masked_mean(values, mask):
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(values * mask) / denom


def compute(loss_config, event, diff, subdiff, mean_contrast_threshold):
    """Compute the per-term mean losses.

    Args:
        loss_config: ConfigDict with error_fn/weight/normalize subtrees
            (reference YAML schema).
        event: dict with log_intensity_diff and dt (f32 ns effective
            interval length, end - (start + tau)).
        diff: dict with log_intensity_diff, ts_diff, is_valid — or None.
        subdiff: dict with log_intensity_diff, is_valid — or None.
        mean_contrast_threshold: scalar.
    Returns:
        dict of scalar mean losses (unweighted).
    """
    out = {}
    log_intensity_grad = (
        event["log_intensity_diff"]
        / event["dt"].astype(event["log_intensity_diff"].dtype)
    )

    if loss_config.weight.log_intensity_diff > 0:
        err_fn = ERROR_FNS[loss_config.error_fn.log_intensity_diff]
        norm = mean_contrast_threshold \
            if loss_config.normalize.log_intensity_diff else 1.0
        target = (
            diff["ts_diff"].astype(log_intensity_grad.dtype)
            * log_intensity_grad / norm
        )
        err = err_fn(diff["log_intensity_diff"] / norm, target)
        out["log_intensity_diff"] = masked_mean(err, diff["is_valid"])

    if loss_config.weight.log_intensity_tv > 0:
        err_fn = ERROR_FNS[loss_config.error_fn.log_intensity_tv]
        norm = mean_contrast_threshold \
            if loss_config.normalize.log_intensity_tv else 1.0
        err = err_fn(
            subdiff["log_intensity_diff"] / norm,
            jnp.zeros_like(subdiff["log_intensity_diff"]),
        )
        out["log_intensity_tv"] = masked_mean(err, subdiff["is_valid"])
    return out
